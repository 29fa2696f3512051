"""Pallas TPU kernel for ETC1 block encoding — the texture hot loop.

Layout: **blocks ride the lane axis**. The host-side wrapper arranges
each 4x4 block's pixels into 96 sublane rows — (flip, subblock, channel,
pixel) — over a [96, B] uint8 array, so every vector op in the kernel
runs at full 128-lane width (the round-1 kernel kept blocks on sublanes
and pixels on lanes, using 8-24 of 128 lanes; this layout is ~7x faster
at bit-identical output).

Search math: the table search is the two-pass scheme of
`etc.py _best_table_and_codes` (linear ranking, exact top-2 refine);
per-candidate errors use the reduced form ``K - 2*dot`` (the
``sum p^2`` term is candidate-invariant). All quantities are integers
below 2^24, exact in f32, so every compare (and argmin tie-break) is
identical to the int32 reference op chain `encode_etc1_blocks` —
parity-tested in tests/test_pallas_parity.py, interpret and compiled.

Differential mode with flip search, bit-identical to
`encode_etc1_blocks` (codecs/basis/etc.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uvol_tpu.codecs.basis.etc import MODIFIER_TABLE

TILE_L = 1024  # blocks (lanes) per kernel instance


def _mean_quant5(sub):
    """[24, T] f32 -> three [1, T] i32 5-bit means.

    Float op order matches `encode_etc1_blocks` exactly — mean (sum/8,
    exact in f32), then *31.0, then /255.0, then round — so half-ulp
    boundary cases round identically."""
    out = []
    for c in range(3):
        s = jnp.sum(sub[c * 8 : (c + 1) * 8, :], axis=0, keepdims=True)
        mean = s * 0.125
        out.append(
            jnp.clip(jnp.round(mean * 31.0 / 255.0), 0.0, 31.0).astype(
                jnp.int32
            )
        )
    return out


def _encode_subblock(sub, base_ch):
    """Two-pass 8-table search for one subblock (same algorithm as
    `etc.py _best_table_and_codes` — all quantities are integers below
    2^23, exact in f32, so ranking/tie-breaks match the int32 reference
    bit-for-bit).

    Pass 1 ranks tables by the unclipped linear error model (cheap —
    the regrouped per-table cost is documented inline below); pass 2
    evaluates the top-2 tables exactly (clipped palettes, per-pixel
    codes) and keeps the better.

    sub [24, T] f32 (channel-major pixel rows); base_ch three [1, T] i32
    extended colors. Returns (table [1,T] i32, codes [8,T] i32,
    err [1,T] f32 — the TRUE total squared error, for the flip compare).
    """
    P = [sub[0:8, :], sub[8:16, :], sub[16:24, :]]
    psq = P[0] * P[0] + P[1] * P[1] + P[2] * P[2]  # [8,T] const across cands
    basef = [b.astype(jnp.float32) for b in base_ch]

    # ---- pass 1: linear table ranking ------------------------------------
    # the reference form is q = k_lin - 2m·g = sb2 + 2m·(sb-g) + 3m² per
    # signed mod m ∈ {±s, ±l}; the best sign is -sign(sb-g), so the min
    # over the 4 mods is sb2 + min_{m'∈{s,l}}(3m'² - 2m'·|sb-g|) — and the
    # per-lane constant sb2 shifts every table's total equally, so it
    # drops out of the ranking. All quantities are integers < 2^24, exact
    # in f32: the regrouped op chain ranks identically to the reference
    # (5 vector ops per table instead of 12).
    g = P[0] + P[1] + P[2]  # [8,T]
    sb = basef[0] + basef[1] + basef[2]  # [1,T]
    au = jnp.abs(sb - g)  # [8,T]
    tab_tots = []
    for tab in range(8):
        s_m = float(MODIFIER_TABLE[tab][0])
        l_m = float(MODIFIER_TABLE[tab][1])
        qs = (3.0 * s_m * s_m) - (2.0 * s_m) * au  # [8,T]
        ql = (3.0 * l_m * l_m) - (2.0 * l_m) * au
        tab_tots.append(
            jnp.sum(jnp.minimum(qs, ql), axis=0, keepdims=True)
        )  # [1,T]
    first_tot, first_tab = tab_tots[0], jnp.zeros(sb.shape, jnp.int32)
    for tab in range(1, 8):
        better = tab_tots[tab] < first_tot  # strict: lowest index wins
        first_tot = jnp.where(better, tab_tots[tab], first_tot)
        first_tab = jnp.where(better, jnp.int32(tab), first_tab)
    mask = jnp.float32(1 << 30)  # > any total; exact in f32
    sec_tot = sec_tab = None
    for tab in range(8):
        t = jnp.where(first_tab == tab, mask, tab_tots[tab])
        if sec_tot is None:
            sec_tot, sec_tab = t, jnp.zeros(sb.shape, jnp.int32)
        else:
            better = t < sec_tot
            sec_tot = jnp.where(better, t, sec_tot)
            sec_tab = jnp.where(better, jnp.int32(tab), sec_tab)

    # ---- pass 2: exact refine of the two ranked tables -------------------
    def exact_eval(tabi):
        ms = _sel8_vec(tabi, MODIFIER_TABLE[:, 0]).astype(jnp.float32)
        ml = _sel8_vec(tabi, MODIFIER_TABLE[:, 1]).astype(jnp.float32)
        best_red = best_codes = None
        # candidate order matches _MODS rows: +small, +large, -small, -large
        for code, m in enumerate((ms, ml, -ms, -ml)):
            cb = [jnp.clip(b + m, 0.0, 255.0) for b in basef]  # [1,T]
            K = cb[0] * cb[0] + cb[1] * cb[1] + cb[2] * cb[2]
            dot = cb[0] * P[0] + cb[1] * P[1] + cb[2] * P[2]  # [8,T]
            red = K - 2.0 * dot
            if best_red is None:
                best_red = red
                best_codes = jnp.zeros(red.shape, jnp.int32)
            else:
                better = red < best_red  # strict: first minimum wins
                best_red = jnp.where(better, red, best_red)
                best_codes = jnp.where(better, jnp.int32(code), best_codes)
        return best_codes, jnp.sum(best_red, axis=0, keepdims=True)

    c1, e1 = exact_eval(first_tab)
    c2, e2 = exact_eval(sec_tab)
    better = e2 < e1  # strict: pass-1 winner keeps ties
    best_tab = jnp.where(better, sec_tab, first_tab)
    best_codes = jnp.where(jnp.broadcast_to(better, c1.shape), c2, c1)
    best_red = jnp.where(better, e2, e1)
    true_err = best_red + jnp.sum(psq, axis=0, keepdims=True)
    return best_tab, best_codes, true_err


def _encode_subblocks(flip_subs, t):
    """Shared search body: `flip_subs` = [(sub0, sub1)] per flip, each
    [24, T] f32 channel-major pixel rows. Returns the winning [2, T]
    word planes (identical math for both input layouts)."""
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, t), 0)

    results = []
    for flip in (0, 1):
        sub0, sub1 = flip_subs[flip]
        m0 = _mean_quant5(sub0)  # three [1,T] in 0..31
        m1 = _mean_quant5(sub1)
        d = [jnp.clip(b - a, -4, 3) for a, b in zip(m0, m1)]
        b0 = [(a << 3) | (a >> 2) for a in m0]
        m1c = [a + dd for a, dd in zip(m0, d)]
        b1 = [(a << 3) | (a >> 2) for a in m1c]
        t0, c0, e0 = _encode_subblock(sub0, b0)
        t1, c1, e1 = _encode_subblock(sub1, b1)
        err = e0 + e1  # [1,T]
        du = [dd & 0x7 for dd in d]
        word1 = (
            (m0[0] << 27) | (du[0] << 24)
            | (m0[1] << 19) | (du[1] << 16)
            | (m0[2] << 11) | (du[2] << 8)
            | (t0 << 5) | (t1 << 2) | (1 << 1) | flip
        )  # [1,T]
        # pixel-index planes: per-row static shifts (j = x*4+y per spec)
        if flip == 0:
            j0, j1 = iota8, iota8 + 8  # pix order x*4+y within each half
        else:
            j0 = (iota8 // 2) * 4 + (iota8 % 2)  # pix order x*2+y, rows 0-1
            j1 = j0 + 2  # rows 2-3
        lsb = jnp.sum((c0 & 1) << j0, axis=0, keepdims=True) + jnp.sum(
            (c1 & 1) << j1, axis=0, keepdims=True
        )
        msb = jnp.sum(((c0 >> 1) & 1) << j0, axis=0, keepdims=True) + jnp.sum(
            ((c1 >> 1) & 1) << j1, axis=0, keepdims=True
        )
        word2 = lsb + (msb << 16)
        results.append((word1, word2, err))

    w1_0, w2_0, e_0 = results[0]
    w1_1, w2_1, e_1 = results[1]
    use1 = e_1 < e_0
    word1 = jnp.where(use1, w1_1, w1_0)
    word2 = jnp.where(use1, w2_1, w2_0)
    return jnp.concatenate([word1, word2], axis=0)  # [2, T]


def _kernel(x_ref, out_ref):
    # Mosaic has no direct u8->f32 cast; hop through int32
    xf = x_ref[:].astype(jnp.int32).astype(jnp.float32)  # [96, T]
    t = xf.shape[1]
    flip_subs = [
        (xf[f * 48 : f * 48 + 24, :], xf[f * 48 + 24 : f * 48 + 48, :])
        for f in (0, 1)
    ]
    out_ref[:] = _encode_subblocks(flip_subs, t)


def _prepare_layout(blocks: jax.Array) -> jax.Array:
    """[B, 4, 4, 3] uint8 -> [96, B] uint8 lane-major layout.

    Row r = (flip, subblock, channel, pixel): four 24-row groups, one per
    (flip, subblock); within a group, channel-major with pixel order
    x*4+y (flip 0) / x*2+y (flip 1) so the kernel's shift vectors are
    simple iota math."""
    px = blocks  # [B, y, x, ch] uint8
    groups = []
    for flip in (0, 1):
        for sb in (0, 1):
            if flip == 0:
                sel = px[:, :, 2 * sb : 2 * sb + 2, :]  # [B, y4, x2, ch]
            else:
                sel = px[:, 2 * sb : 2 * sb + 2, :, :]  # [B, y2, x4, ch]
            arr = jnp.transpose(sel, (3, 2, 1, 0))  # [ch, x, y, B]
            groups.append(arr.reshape(24, px.shape[0]))
    return jnp.concatenate(groups, axis=0)


@functools.partial(jax.jit, static_argnums=(1,))
def encode_etc1_blocks_pallas(
    blocks: jax.Array, interpret: bool = False
) -> jax.Array:
    """[B, 4, 4, 3] uint8 → [B, 2] uint32; B padded to the tile size.

    `interpret=True` runs through the Pallas interpreter (CPU parity)."""
    b = blocks.shape[0]
    x96 = _prepare_layout(blocks.astype(jnp.uint8))
    padded = -(-b // TILE_L) * TILE_L
    if padded != b:
        x96 = jnp.pad(x96, ((0, 0), (0, padded - b)))
    words = pl.pallas_call(
        _kernel,
        grid=(padded // TILE_L,),
        in_specs=[
            pl.BlockSpec((96, TILE_L), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, TILE_L), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2, padded), jnp.int32),
        interpret=interpret,
    )(x96)
    return jax.lax.bitcast_convert_type(
        jnp.transpose(words[:, :b], (1, 0)), jnp.uint32
    )


# ---------------------------------------------------------------------------
# Decode kernel: blocks on lanes again — [2, B] words in, [48, B] pixel
# rows out (channel-major, image-raster pixel order y*4+x within each
# channel group), padded to 64 sublanes for the int8 tile shape.
# ---------------------------------------------------------------------------

_DEC_ROWS = 64  # 48 pixel rows (3 ch x 16 px) padded to the u8 sublane tile


def _sel8_vec(table, vals):
    """Arithmetic 8-way select of scalar table `vals` by [R, T] indices
    (same trick as etc.py _select8 — gathers from tiny tables lower
    badly on TPU; three where levels don't)."""
    b0 = (table & 1) == 1
    b1 = ((table >> 1) & 1) == 1
    b2 = ((table >> 2) & 1) == 1
    v = [jnp.int32(int(x)) for x in vals]
    lo = jnp.where(b1, jnp.where(b0, v[3], v[2]), jnp.where(b0, v[1], v[0]))
    hi = jnp.where(b1, jnp.where(b0, v[7], v[6]), jnp.where(b0, v[5], v[4]))
    return jnp.where(b2, hi, lo)


def _dec_kernel(w_ref, out_ref):
    w1 = w_ref[0:1, :]
    w2 = w_ref[1:2, :]
    t = w1.shape[1]
    px = _dec_px_rows(w1, w2, t, raster_rows=True)
    pad = jnp.zeros((_DEC_ROWS - 48, t), jnp.int32)
    out_ref[:] = jnp.concatenate([px, pad], axis=0).astype(jnp.uint8)


def _dec_px_rows(w1, w2, t, raster_rows):
    """Word planes [1, T] -> pixel rows [48, T] int32 (channel-major;
    row order y*4+x when `raster_rows` else x*4+y)."""
    diff = (w1 >> 1) & 1
    flip = w1 & 1
    t0 = (w1 >> 5) & 7
    t1 = (w1 >> 2) & 7

    # differential + individual base colors (decode_etc1_blocks math)
    base0 = []
    base1 = []
    for sh5, sh3, sh4a, sh4b in ((27, 24, 28, 24), (19, 16, 20, 16),
                                 (11, 8, 12, 8)):
        m0 = (w1 >> sh5) & 31
        draw = (w1 >> sh3) & 7
        d = jnp.where(draw >= 4, draw - 8, draw)
        m1 = jnp.clip(m0 + d, 0, 31)
        b0d = (m0 << 3) | (m0 >> 2)
        b1d = (m1 << 3) | (m1 >> 2)
        i0 = (w1 >> sh4a) & 15
        i1 = (w1 >> sh4b) & 15
        b0i = (i0 << 4) | i0
        b1i = (i1 << 4) | i1
        base0.append(jnp.where(diff == 1, b0d, b0i))  # [1, T]
        base1.append(jnp.where(diff == 1, b1d, b1i))

    # per-pixel planes: row r is image-raster order r = y*4 + x (or
    # column-major r = x*4 + y for the relayout kernel); the wire bit
    # index for pixel (x, y) is x*4 + y
    r = jax.lax.broadcasted_iota(jnp.int32, (16, t), 0)
    if raster_rows:
        x = r % 4
        y = r // 4
    else:
        x = r // 4
        y = r % 4
    jbit = x * 4 + y
    lsb = (w2 >> jbit) & 1  # [16, T] (w1/w2 broadcast over rows)
    msb = (w2 >> (jbit + 16)) & 1
    code = (msb << 1) | lsb
    # int32 arithmetic blend instead of where-on-bool-operands: Mosaic
    # rejects the i8->i1 truncation that select-of-compares lowers to
    ys = (y >= 2).astype(jnp.int32)
    xs = (x >= 2).astype(jnp.int32)
    in1 = flip * ys + (1 - flip) * xs  # [16, T] 0/1
    table = t0 + (t1 - t0) * in1  # [16, T]
    small = _sel8_vec(table, MODIFIER_TABLE[:, 0])
    large = _sel8_vec(table, MODIFIER_TABLE[:, 1])
    mag = small + (large - small) * (code & 1)
    mod = (1 - (code & 2)) * mag  # code msb = sign: (1 - 2*msb) * mag

    rows = []
    for ch in range(3):
        base = base0[ch] + (base1[ch] - base0[ch]) * in1  # [16, T]
        rows.append(jnp.clip(base + mod, 0, 255))
    return jnp.concatenate(rows, axis=0)  # [48, T] int32


@functools.partial(jax.jit, static_argnums=(1,))
def decode_etc1_blocks_pallas(
    words: jax.Array, interpret: bool = False
) -> jax.Array:
    """[B, 2] uint32 → [B, 4, 4, 3] uint8, bit-identical to
    `decode_etc1_blocks` (parity-locked in tests/test_pallas_parity.py)."""
    b = words.shape[0]
    w = jnp.transpose(
        jax.lax.bitcast_convert_type(words, jnp.int32), (1, 0)
    )  # [2, B]
    padded = -(-b // TILE_L) * TILE_L
    if padded != b:
        w = jnp.pad(w, ((0, 0), (0, padded - b)))
    out = pl.pallas_call(
        _dec_kernel,
        grid=(padded // TILE_L,),
        in_specs=[
            pl.BlockSpec((2, TILE_L), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_DEC_ROWS, TILE_L), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((_DEC_ROWS, padded), jnp.uint8),
        interpret=interpret,
    )(w)
    px = out[:48, :b]  # [48, B] ch-major, pixel raster y*4+x
    return jnp.transpose(px.reshape(3, 16, b), (2, 1, 0)).reshape(b, 4, 4, 3)




# ---------------------------------------------------------------------------
# Strip-planar codec: the TPU-native texture layout.
#
# The block-level entry points above spend more time in XLA relayouts
# than in the kernels: `image_to_blocks` / `_prepare_layout` /
# `blocks_to_image` are transposes whose minor dimension is 3 (channels)
# or 4 (block pixels) — shapes TPUs move ~50x below HBM bandwidth, and
# Mosaic has no strided lane shuffle to do the regroup in-kernel.
#
# The fix is a layout contract. **Strip-planar** stores a [F, H, W, 3]
# uint8 batch as [F*(H/4)*4, 12*(W/4)] uint8:
#
#     strips[(f*nby + by)*4 + dy, (c*4 + dx)*nbx + bx]
#         = imgs[f, 4*by + dy, 4*bx + dx, c]
#
# i.e. each 4-row image strip keeps its rows, and the lane axis is
# regrouped from interleaved (x, channel) into 12 contiguous
# (channel, dx) planes of block columns. Every 4x4 block's 48 values
# then live on one lane (bx) across 48 static (row, plane) positions —
# the encode kernel reads them with contiguous lane slices and the
# decode kernel writes them with contiguous lane concats, so the codecs
# run with ZERO relayout ops.
#
# Converting between interleaved images and strips is a lane
# permutation, which is exactly what the MXU does for free: one int8
# matmul against a constant 0/1 permutation matrix (pixels are biased
# by -128 into int8 via XOR, accumulated exactly in int32 — each output
# is a single-term dot product, so the conversion is exact). A real TPU
# pipeline converts once at ingest/egress and stays strip-planar
# throughout; `TextureSequenceCodec` does exactly that.
# ---------------------------------------------------------------------------


def _perm_matrix_i8(nbx: int) -> jax.Array:
    """[3W, 3W] int8 permutation: interleaved lane l = (4*bx+dx)*3 + c
    maps to plane lane m = (c*4 + dx)*nbx + bx. Built from iota compares
    so XLA constant-folds it — nothing is uploaded."""
    w3 = 12 * nbx
    m = jnp.arange(w3)
    c = m // (4 * nbx)
    dx = (m // nbx) % 4
    bx = m % nbx
    l_of_m = (4 * bx + dx) * 3 + c
    return (jnp.arange(w3)[:, None] == l_of_m[None, :]).astype(jnp.int8)


def _perm_mm(x2d: jax.Array, p: jax.Array) -> jax.Array:
    """Exact uint8 lane permutation on the MXU: (x-128) int8 @ 0/1 int8,
    int32 accumulation, +128 back to uint8."""
    xi = jax.lax.bitcast_convert_type(x2d ^ jnp.uint8(128), jnp.int8)
    y = jax.lax.dot_general(
        xi, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (y + 128).astype(jnp.uint8)


@jax.jit
def images_to_strips(frames: jax.Array) -> jax.Array:
    """[F, H, W, 3] uint8 -> strip-planar [F*(H/4)*4, 12*(W/4)] uint8."""
    f, h, w, _ = frames.shape
    return _perm_mm(frames.reshape(f * h, 3 * w), _perm_matrix_i8(w // 4))


def _perm_matrix_i8_inv(nbx: int) -> jax.Array:
    """Inverse of `_perm_matrix_i8`, built directly from iota compares
    (constant-folded; avoids a runtime transpose of the 3Wx3W constant)."""
    w3 = 12 * nbx
    ll = jnp.arange(w3)
    bx = ll // 12
    dx = (ll % 12) // 3
    c = ll % 3
    m_of_l = (c * 4 + dx) * nbx + bx
    return (jnp.arange(w3)[:, None] == m_of_l[None, :]).astype(jnp.int8)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def strips_to_images(strips: jax.Array, f: int, h: int, w: int) -> jax.Array:
    """Strip-planar [F*(H/4)*4, 12*(W/4)] uint8 -> [F, H, W, 3] uint8."""
    img = _perm_mm(strips, _perm_matrix_i8_inv(w // 4))
    return img.reshape(f, h, w, 3)


_STRIPS_PER_TILE = 4  # S: strips (4 image rows each) per kernel instance


def _strip_supported(nbx: int) -> bool:
    # lane tiles: input 12*nbx and output S*nbx must be 128-multiples
    return nbx % 32 == 0


def _enc_strip_kernel(x_ref, o_ref):
    """[4S, 12*nbx] uint8 strip tile -> [2, S*nbx] int32 words.

    Per-strip narrow searches. The S-strips-merged-on-lanes variant
    (one `_encode_subblocks` at S*nbx width, single full-block store)
    was MEASURED ON-CHIP (v5e, 2026-08-19, interleaved A/B medians):
    10.02 vs 9.81 ms @1024^2 F=32 — a wash. Vector-instruction count
    after Mosaic tiling is layout-determined (vregs touched), not
    Python-op-count-determined, so lane-merging only amortizes loop
    bookkeeping it doesn't have; the narrow form is kept as the proven
    shape (same conclusion as the wide DECODE experiment below)."""
    s_count = x_ref.shape[0] // 4
    nbx = x_ref.shape[1] // 12
    for s in range(s_count):
        xf = (
            x_ref[4 * s : 4 * s + 4, :].astype(jnp.int32).astype(jnp.float32)
        )  # [4, 12*nbx]

        def strip(c, dx):  # [4, nbx] rows dy of plane (c, dx)
            g = c * 4 + dx
            return xf[:, g * nbx : (g + 1) * nbx]

        f0 = [
            jnp.concatenate(
                [strip(c, 2 * sb + xr) for c in range(3) for xr in range(2)],
                axis=0,
            )
            for sb in (0, 1)
        ]
        f1 = [
            jnp.concatenate(
                [
                    strip(c, xx)[2 * sb : 2 * sb + 2, :]
                    for c in range(3)
                    for xx in range(4)
                ],
                axis=0,
            )
            for sb in (0, 1)
        ]
        o_ref[:, nbx * s : nbx * (s + 1)] = _encode_subblocks(
            [(f0[0], f0[1]), (f1[0], f1[1])], nbx
        )


def _dec_strip_kernel(w_ref, o_ref):
    """[2, S*nbx] int32 words -> [4S, 12*nbx] uint8 strip tile.

    Rows are written plane-by-plane with sub-slice stores — Mosaic's
    lane-concatenate rejects operands at mixed sublane offsets, but
    strided ref stores handle the scatter fine."""
    s_count = o_ref.shape[0] // 4
    nbx = o_ref.shape[1] // 12
    # per-strip decode. The one-pass s_count*nbx-wide variant (all strips
    # decoded at full lane width, stores lane-sliced from the wide value)
    # was MEASURED ON-CHIP (v5e, 2026-08-18): ~8% slower (1486 vs 1612
    # fps median @1024^2x16) — the lane-offset sub-slices it needs on the
    # store side cost more than the extra op-issue overhead here saves.
    for s in range(s_count):
        w1 = w_ref[0:1, nbx * s : nbx * (s + 1)]
        w2 = w_ref[1:2, nbx * s : nbx * (s + 1)]
        px = _dec_px_rows(w1, w2, nbx, raster_rows=False)  # [48, nbx]
        u8 = px.astype(jnp.uint8)
        # px rows (c, dx, dy): rows g*4..g*4+3 ARE the strip's dy rows of
        # plane g — one contiguous [4, nbx] store per plane
        for g in range(12):  # g = c*4 + dx
            o_ref[
                4 * s : 4 * s + 4, g * nbx : (g + 1) * nbx
            ] = u8[g * 4 : g * 4 + 4, :]


@functools.partial(jax.jit, static_argnums=(1, 2))
def encode_etc1_strips_pallas(
    strips: jax.Array, nbx: int, interpret: bool = False
) -> jax.Array:
    """Strip-planar [M, 12*nbx] uint8 -> [2, (M/4)*nbx] int32 word
    planes (blocks in frame-major raster order). Bit-identical words to
    `encode_etc1_blocks_pallas` per block."""
    if not _strip_supported(nbx):
        raise ValueError(f"strip codec needs nbx % 32 == 0, got {nbx}")
    m = strips.shape[0]
    s = _STRIPS_PER_TILE
    rows_per = 4 * s
    m_pad = -(-m // rows_per) * rows_per
    if m_pad != m:
        strips = jnp.pad(strips, ((0, m_pad - m), (0, 0)))
    n_pad = (m_pad // 4) * nbx
    words = pl.pallas_call(
        _enc_strip_kernel,
        grid=(m_pad // rows_per,),
        in_specs=[
            pl.BlockSpec((rows_per, 12 * nbx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, s * nbx), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2, n_pad), jnp.int32),
        interpret=interpret,
    )(strips)
    return words[:, : (m // 4) * nbx]


@functools.partial(jax.jit, static_argnums=(1, 2))
def decode_etc1_strips_pallas(
    words2: jax.Array, nbx: int, interpret: bool = False
) -> jax.Array:
    """[2, N] int32 word planes -> strip-planar [(N/nbx)*4, 12*nbx]
    uint8, bit-identical pixels to `decode_etc1_blocks_pallas`."""
    if not _strip_supported(nbx):
        raise ValueError(f"strip codec needs nbx % 32 == 0, got {nbx}")
    n = words2.shape[1]
    s = _STRIPS_PER_TILE
    lanes_per = s * nbx
    n_pad = -(-n // lanes_per) * lanes_per
    if n_pad != n:
        words2 = jnp.pad(words2, ((0, 0), (0, n_pad - n)))
    out = pl.pallas_call(
        _dec_strip_kernel,
        grid=(n_pad // lanes_per,),
        in_specs=[
            pl.BlockSpec((2, lanes_per), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4 * s, 12 * nbx), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(((n_pad // nbx) * 4, 12 * nbx),
                                       jnp.uint8),
        interpret=interpret,
    )(words2)
    return out[: (n // nbx) * 4, :]


@functools.partial(jax.jit, static_argnums=(1,))
def encode_etc1_images_pallas(
    frames: jax.Array, interpret: bool = False
) -> jax.Array:
    """[F, H, W, 3] uint8 -> [2, F*nb] int32 word planes: strip-planar
    ingest (one MXU permutation) + the strip codec."""
    f, h, w, _ = frames.shape
    return encode_etc1_strips_pallas(
        images_to_strips(frames), w // 4, interpret
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def decode_etc1_images_pallas(
    words2: jax.Array, f: int, h: int, w: int, interpret: bool = False
) -> jax.Array:
    """[2, F*nb] int32 word planes -> [F, H, W, 3] uint8 via the strip
    codec + one MXU permutation egress."""
    strips = decode_etc1_strips_pallas(words2, w // 4, interpret)
    return strips_to_images(strips, f, h, w)


def pack_words2(words2, f: int):
    """Device [2, F*nb] int32 -> host wire [F, nb, 2] uint32 (numpy)."""
    import numpy as np

    a = np.asarray(words2).astype(np.uint32)  # [2, F*nb]
    return np.ascontiguousarray(a.reshape(2, f, -1).transpose(1, 2, 0))


def unpack_words2(words):
    """Host wire [F, nb, 2] uint32 -> device-layout [2, F*nb] int32."""
    import numpy as np

    a = np.asarray(words, np.uint32).transpose(2, 0, 1).reshape(2, -1)
    return np.ascontiguousarray(a).astype(np.int32)
