import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvol_tpu.ops import (
    delta_decode,
    delta_encode,
    estimate_normals,
    morton30,
    morton_order,
    octahedral_decode,
    octahedral_encode,
    parallelogram_decode,
    parallelogram_encode,
    quantize,
    dequantize,
    zigzag_decode,
    zigzag_encode,
)


def rng(seed=0):
    return np.random.default_rng(seed)


def test_quantize_dequantize_error_bound():
    x = jnp.asarray(rng().uniform(-3, 7, (100, 3)), jnp.float32)
    for qbits in (8, 11):
        q = quantize(x, qbits)
        x2 = dequantize(q, qbits)
        step = float(q.range_value) / ((1 << qbits) - 1)
        assert float(jnp.max(jnp.abs(x - x2))) <= step / 2 + 1e-6


def test_quantize_batched_masked():
    r = rng(1)
    x = jnp.asarray(r.uniform(0, 1, (4, 50, 3)), jnp.float32)
    mask = jnp.arange(50)[None, :] < jnp.asarray([50, 30, 10, 50])[:, None]
    q = quantize(x, 11, mask=mask)
    assert q.values.shape == (4, 50, 3)
    # masked-out rows quantize to 0 and do not affect the transform
    q_single = quantize(x[1, :30], 11)
    np.testing.assert_array_equal(np.asarray(q.values[1, :30]), np.asarray(q_single.values))
    assert np.all(np.asarray(q.values[1, 30:]) == 0)


def test_zigzag_roundtrip():
    v = jnp.asarray([0, -1, 1, -2, 2, 100, -100], jnp.int32)
    u = zigzag_encode(v)
    np.testing.assert_array_equal(np.asarray(u), [0, 1, 2, 3, 4, 200, 199])
    np.testing.assert_array_equal(np.asarray(zigzag_decode(u)), np.asarray(v))


def test_delta_roundtrip():
    v = jnp.asarray(rng(2).integers(-1000, 1000, (3, 64, 2)), jnp.int32)
    np.testing.assert_array_equal(np.asarray(delta_decode(delta_encode(v))), np.asarray(v))


def _fan_pred_indices(n):
    """Simple traversal: vertex i predicted from (i-1, i-2, i-3) when possible."""
    idx = np.full((n, 3), -1, np.int32)
    for i in range(3, n):
        idx[i] = (i - 1, i - 2, i - 3)
    return jnp.asarray(idx)


def test_parallelogram_roundtrip():
    n = 40
    v = jnp.asarray(rng(3).integers(0, 2047, (n, 3)), jnp.int32)
    pidx = _fan_pred_indices(n)
    res = parallelogram_encode(v, pidx)
    v2 = parallelogram_decode(res, pidx)
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v))


def test_parallelogram_roundtrip_batched_jit():
    f, n = 5, 32
    v = jnp.asarray(rng(4).integers(0, 1023, (f, n, 3)), jnp.int32)
    pidx = jnp.broadcast_to(_fan_pred_indices(n), (f, n, 3))
    enc = jax.jit(parallelogram_encode)
    dec = jax.jit(parallelogram_decode)
    np.testing.assert_array_equal(np.asarray(dec(enc(v, pidx), pidx)), np.asarray(v))


def test_octahedral_roundtrip_accuracy():
    r = rng(5)
    n = r.normal(size=(500, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    n = jnp.asarray(n, jnp.float32)
    for qbits, tol in ((8, 2e-2), (10, 6e-3)):
        st = octahedral_encode(n, qbits)
        n2 = octahedral_decode(st, qbits)
        dot = jnp.sum(n * n2, axis=-1)
        assert float(jnp.min(dot)) > 1 - tol
        mx = (1 << qbits) - 2
        assert int(jnp.min(st)) >= 0 and int(jnp.max(st)) <= mx


def test_octahedral_axes_exact():
    axes = jnp.asarray(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [-1, 0, 0], [0, -1, 0], [0, 0, -1]],
        jnp.float32,
    )
    st = octahedral_encode(axes, 10)
    n2 = octahedral_decode(st, 10)
    np.testing.assert_allclose(np.asarray(n2), np.asarray(axes), atol=1e-6)


def test_estimate_normals_plane():
    # flat square in z=0 plane → all normals +z
    pos = jnp.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3], [-1, -1, -1]], jnp.int32)
    n = estimate_normals(pos, faces)
    np.testing.assert_allclose(np.asarray(n), [[0, 0, 1]] * 4, atol=1e-6)


def test_morton30_known():
    q = jnp.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1], [2, 0, 0]], jnp.int32)
    codes = np.asarray(morton30(q))
    np.testing.assert_array_equal(codes, [1, 2, 4, 7, 8])


def test_morton_order_locality():
    r = rng(6)
    q = jnp.asarray(r.integers(0, 1 << 10, (1, 256, 3)), jnp.int32)
    perm = morton_order(q)
    sorted_codes = np.asarray(morton30(jnp.take_along_axis(q, perm[..., None], axis=-2)))
    assert np.all(np.diff(sorted_codes[0].astype(np.int64)) >= 0)


def test_morton_order_21bit_coords():
    """Coordinate bit 20 must participate in the sort with z>y>x
    significance (it was dropped for x and mis-ordered for y/z)."""
    import jax.numpy as jnp
    import numpy as np

    from uvol_tpu.ops.morton import morton_order

    big = 1 << 20
    q = jnp.asarray(
        np.array([[big, 0, 0], [0, 0, 0], [0, 0, big], [big - 1, 0, 0]],
                 np.int32)[None]
    )
    perm = np.asarray(morton_order(q))[0]
    # ascending morton: origin first, then x-bit20, then z-bit20 (highest)
    assert list(perm) == [1, 3, 0, 2], list(perm)


def test_parallelogram_roundtrip_first_delta_false():
    """Vertex 0 must predict from zero in BOTH directions (the encoder's
    rolled `prev` used values[N-1] for row 0 when first_delta=False)."""
    import jax.numpy as jnp
    import numpy as np

    from uvol_tpu.ops.prediction import (
        parallelogram_decode,
        parallelogram_encode,
    )

    r = np.random.default_rng(0)
    vals = jnp.asarray(r.integers(-50, 50, (6, 3)).astype(np.int32))
    pidx = jnp.asarray(
        np.array(
            [[-1, 0, 0], [-1, 0, 0], [0, 1, 0], [1, 2, 0], [-1, 0, 0],
             [2, 3, 1]],
            np.int32,
        )
    )
    for fd in (True, False):
        res = parallelogram_encode(vals, pidx, first_delta=fd)
        back = parallelogram_decode(res, pidx, first_delta=fd)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(vals))
