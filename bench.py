"""uvol-tpu benchmark: encode+decode a 30 fps volumetric stream on one chip.

Measures the device compute path of the flagship pipeline on liam-scale
frames (26k-vertex geometry at qp11/qt10 + 1024² ETC1/ETC2 texture blocks):
batched quantize→predict→zigzag, the inverse reconstruction, and texture
block encode+decode. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N/30}
vs_baseline is the real-time multiple against the reference's implied
30 fps bar (BASELINE.md "implied real-time bar").
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from uvol_tpu.codecs.basis.etc import (
        decode_etc1_blocks,
        encode_etc1_blocks,
        image_to_blocks,
    )
    from uvol_tpu.ops.prediction import delta_decode, delta_encode
    from uvol_tpu.ops.quantize import (
        QuantizedAttr,
        dequantize,
        quantize,
        zigzag_decode,
        zigzag_encode,
    )

    r = np.random.default_rng(0)
    F = 8  # frames per batch
    N = 26145  # liam-scale vertex count
    H = W = 1024  # liam texture resolution

    # liam-like content: smooth surface + textured image
    theta = r.uniform(0, np.pi, N)
    phi = r.uniform(0, 2 * np.pi, N)
    base = np.stack(
        [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)], -1
    )
    positions = jnp.asarray(
        np.stack([base * (1 + 0.01 * k) for k in range(F)]), jnp.float32
    )
    uvs = jnp.asarray(r.uniform(0, 1, (F, N, 2)), jnp.float32)
    mask = jnp.ones((F, N), bool)
    yy, xx = np.mgrid[0:H, 0:W]
    tex = np.stack([(xx // 4) % 256, (yy // 4) % 256, ((xx + yy) // 8) % 256], -1)
    textures = jnp.asarray(
        np.stack([np.roll(tex, k, axis=1) for k in range(F)]).astype(np.uint8)
    )

    @jax.jit
    def encode(pos, uv, m, tex_u8):
        qp = quantize(pos, 11, mask=m)
        qu = quantize(uv, 10, mask=m)
        pos_syms = zigzag_encode(delta_encode(qp.values))
        uv_syms = zigzag_encode(delta_encode(qu.values))
        words = jax.vmap(encode_etc1_blocks)(image_to_blocks(tex_u8))
        return pos_syms, uv_syms, qp, qu, words

    @jax.jit
    def decode(pos_syms, uv_syms, pmin, prange, umin, urange, words):
        qpos = delta_decode(zigzag_decode(pos_syms))
        pos = dequantize(QuantizedAttr(qpos, pmin, prange), 11)
        quv = delta_decode(zigzag_decode(uv_syms))
        uv = dequantize(QuantizedAttr(quv, umin, urange), 10)
        blocks = jax.vmap(decode_etc1_blocks)(words)
        return pos, uv, blocks

    # warmup/compile
    ps, us, qp, qu, words = encode(positions, uvs, mask, textures)
    out = decode(ps, us, qp.min_value, qp.range_value, qu.min_value, qu.range_value, words)
    jax.block_until_ready(out)

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        ps, us, qp, qu, words = encode(positions, uvs, mask, textures)
        out = decode(
            ps, us, qp.min_value, qp.range_value, qu.min_value, qu.range_value, words
        )
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = reps * F / dt

    # correctness spot check: reconstruction error within quantization step
    err = float(jnp.max(jnp.abs(out[0] - positions)))
    step = float(jnp.max(qp.range_value)) / 2047
    assert err <= step, (err, step)

    print(
        json.dumps(
            {
                "metric": "encode+decode frames/sec/chip (26k-vert geom + 1024^2 etc tex)",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
