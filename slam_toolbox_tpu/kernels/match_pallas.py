"""Pallas TPU kernel for the coarse correlative-match scoring pass.

Why: XLA lowers the (na, B, ny, nx) scoring gather to ~100M scalar
gathers/s on TPU (~145 ms per match at the online-sync workload). This
kernel restructures the memory access: coarse candidates sit on a stride-2
cell lattice, so the raster is parity-split into 4 subgrids in which each
beam's candidate window is a *contiguous* block; the kernel keeps the
subgrids resident in VMEM and performs one aligned (64, 128) vector read
per (angle, beam) instead of ~700 scalar gathers.

Mosaic requires sublane-aligned dynamic row offsets, so reads are aligned
down to a multiple of 32 rows and accumulated into one of 32 row-phase
accumulators; the phases are recombined with static shifts after the beam
loop (static sub-tile slices are legal).

Layout contract (prepare_parity_grid / prepare_tables, both plain XLA):
  - parity grid (4, HP, WP) int8 with zero borders sized so any clamped
    window read lands in zeros — out-of-grid cells contribute 0 exactly
    like the reference's per-cell bounds skip (Mapper.cpp:1190-1198);
  - per-(angle, beam) descriptor table (na, B, 4) int32, SMEM-blocked:
    [parity 0..3, row (phase-unaligned), col, valid 0/1].

Output: (na, 32, 128) int32 window sums; callers slice [:, :ny, :nx].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ACC_C = 128              # output window lanes (nx <= 128 usable)
READ_C = 256             # aligned read lanes: ACC_C + 128-lane phase slack
N_PHASE = 32
PAD_TOP = 32
PAD_LEFT, PAD_RIGHT = 128, 288


def acc_rows(ny: int) -> int:
    """Output rows padded to the 32-sublane int8 tile."""
    return _round_up(max(ny, 1), 32)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def pad_bottom(acc_r: int) -> int:
    return acc_r + 2 * N_PHASE


def parity_dims(G: int, acc_r: int = 32):
    gh = (G + 1) // 2
    hp = _round_up(PAD_TOP + gh + pad_bottom(acc_r), 32)
    wp = _round_up(PAD_LEFT + gh + PAD_RIGHT, 128)
    return hp, wp


BEAM_UNROLL = 8          # beams per loop iteration (tables pad B to x8)


def _make_score_kernel(acc_r: int):
    read_r = acc_r + N_PHASE

    def _score_kernel(tbl_ref, pgrid_ref, out_ref, acc_ref):
        B = tbl_ref.shape[2]
        acc_ref[...] = jnp.zeros((N_PHASE, read_r, ACC_C), jnp.int32)

        def one(b):
            p = tbl_ref[0, 0, b]
            r = tbl_ref[0, 1, b]
            c = tbl_ref[0, 2, b]
            v = tbl_ref[0, 3, b]
            ra = pl.multiple_of((r // N_PHASE) * N_PHASE, N_PHASE)
            phi = r - ra
            ca = pl.multiple_of((c // ACC_C) * ACC_C, ACC_C)
            phic = c - ca
            w8 = pgrid_ref[p, pl.ds(ra, read_r), pl.ds(ca, READ_C)]
            # Mosaic's dynamic rotate needs 32-bit data; instead of
            # widening (4x the vector work), bitcast the int8 tile to
            # 4-row-packed int32 words and roll THOSE: a lane permutation
            # commutes with the vertical packing, so bitcast-roll-bitcast
            # is exactly a column roll at 1/4 the cost, and the widen
            # happens after slicing to the 128 output lanes
            w32 = pltpu.bitcast(w8, jnp.int32)
            w32 = pltpu.roll(w32, (READ_C - phic) % READ_C, axis=1)
            w8r = pltpu.bitcast(w32, jnp.int8)
            w = w8r[:, :ACC_C].astype(jnp.int32)
            acc_ref[pl.ds(phi, 1)] += (w * v)[None]

        def body(b, _):
            # unrolled: the per-iteration scalar sequencing (SMEM loads,
            # address arithmetic, loop bookkeeping) is a large share of
            # the per-beam budget (measured 265 -> 190 ns/beam going
            # unroll 1 -> 4 pre-bitroll; unroll 8 + bitroll: 102 ns/beam)
            for k in range(BEAM_UNROLL):
                one(b * BEAM_UNROLL + k)
            return 0

        jax.lax.fori_loop(0, B // BEAM_UNROLL, body, 0)

        out = jnp.zeros((acc_r, ACC_C), jnp.int32)
        for phi in range(N_PHASE):  # static recombination shifts
            out = out + acc_ref[phi, phi:phi + acc_r, :]
        out_ref[0] = out

    return _score_kernel


@functools.partial(jax.jit, static_argnames=("acc_r", "interpret"))
def score_windows(pgrid, tbl, acc_r: int = 32, interpret: bool = False):
    """pgrid: (4, HP, WP) int8 (padded for this acc_r);
    tbl: (na, 4, B) int32 -> (na, acc_r, 128) int32 window sums."""
    na, _, B = tbl.shape
    read_r = acc_r + N_PHASE
    return pl.pallas_call(
        _make_score_kernel(acc_r),
        grid=(na,),
        in_specs=[
            pl.BlockSpec(
                (1, 4, B), lambda a: (a, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, acc_r, ACC_C), lambda a: (a, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((na, acc_r, ACC_C), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((N_PHASE, read_r, ACC_C), jnp.int32)
        ],
        interpret=interpret,
    )(tbl, pgrid)


def prepare_parity_grid(grid2d, acc_r: int = 32):
    """(G, G) int8 -> (4, HP, WP) int8 parity-split with zero borders.
    Subgrid p = 2*(row&1) + (col&1) holds cell (2q+pr, 2t+pc) at
    (q + PAD_TOP, t + PAD_LEFT)."""
    G = grid2d.shape[0]
    gh = (G + 1) // 2
    hp, wp = parity_dims(G, acc_r)
    gpad = jnp.zeros((2 * gh, 2 * gh), jnp.int8)
    gpad = jax.lax.dynamic_update_slice(gpad, grid2d, (0, 0))
    sub = gpad.reshape(gh, 2, gh, 2).transpose(1, 3, 0, 2).reshape(
        4, gh, gh
    )
    out = jnp.zeros((4, hp, wp), jnp.int8)
    return jax.lax.dynamic_update_slice(out, sub, (0, PAD_TOP, PAD_LEFT))


SCAT_TR = 8              # int32 tile rows (band height)
SCAT_TC = 128            # bit-plane words per row


def _make_bit_scatter_kernel(n_bands: int, nb_r: int, rows: int):
    """Banded bit-scatter: points sorted by (plane, row-band); each band
    accumulates a one-hot OR into a (8, 128) int32 register tile and pays
    ONE aligned store. Bit layout is STRIDED — cell t lives in word
    (t % 128), bit (t // 128) — so unpacking is a static 128-lane slice
    per bit plane (a packed layout would need a pathological lane
    interleave). XLA's scatter lowers to ~8M serialized updates/s on TPU
    (~2 ms for the 15k-point running-buffer stamp); this kernel plus the
    sort-based prep runs the same stamp in ~10 us."""

    def kern(tbl_ref, out_ref):
        out_ref[...] = jnp.zeros((4, rows, SCAT_TC), jnp.int32)
        riota = jax.lax.broadcasted_iota(jnp.int32, (SCAT_TR, SCAT_TC), 0)
        ciota = jax.lax.broadcasted_iota(jnp.int32, (SCAT_TR, SCAT_TC), 1)

        def band(bi, _):
            s = tbl_ref[bi]
            e = tbl_ref[bi + 1]

            def one(i, acc):
                w = tbl_ref[n_bands + 1 + i]
                return acc | jnp.where(
                    (riota == ((w >> 12) & 0x7))
                    & (ciota == (w & 0x7F)),
                    jnp.int32(1) << ((w >> 7) & 0x1F), 0,
                )

            acc = jax.lax.fori_loop(
                s, e, one, jnp.zeros((SCAT_TR, SCAT_TC), jnp.int32))
            out_ref[
                bi // nb_r, pl.ds((bi % nb_r) * SCAT_TR, SCAT_TR), :
            ] = acc
            return 0

        jax.lax.fori_loop(0, n_bands, band, 0)

    return kern


def _scatter_bits(points, valid, offset, scale, grid_size: int):
    """Banded bit-scatter of `points` into packed parity bit planes:
    (4, round_up(gh, 8), 128) int32 where cell (p=2*(iy&1)+(ix&1),
    q=iy>>1, t=ix>>1) is bit (t // 128) of word (p, q, t % 128)."""
    from slam_toolbox_tpu.kernels.rasterize import round_half_away

    G = grid_size
    gh = (G + 1) // 2
    rows = _round_up(gh, SCAT_TR)
    nb_r = rows // SCAT_TR
    n_bands = 4 * nb_r
    assert gh <= SCAT_TC * 32 and n_bands < (1 << 14)

    g = round_half_away((points - offset[None, :]) * scale).astype(
        jnp.int32
    )
    ix, iy = g[:, 0], g[:, 1]
    inb = valid & (ix >= 0) & (ix < G) & (iy >= 0) & (iy < G)
    p = 2 * (iy & 1) + (ix & 1)
    q = iy >> 1
    t = ix >> 1
    band = p * nb_r + (q >> 3)
    key = jnp.where(inb, band, n_bands)
    # slot word: key(14b) << 17 | qrow(3b) << 12 | bit(5b) << 7 | word(7b)
    packed = (
        (key << 17) | ((q & 0x7) << 12)
        | ((t // SCAT_TC) << 7) | (t % SCAT_TC)
    )
    srt = jnp.sort(packed)
    starts = jnp.searchsorted(
        srt >> 17, jnp.arange(n_bands + 1, dtype=jnp.int32),
    ).astype(jnp.int32)
    tbl = jnp.concatenate([starts, srt & 0x1FFFF])

    return pl.pallas_call(
        _make_bit_scatter_kernel(n_bands, nb_r, rows),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, rows, SCAT_TC), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(tbl)


def scatter_occupancy_parity(points, valid, offset, scale, grid_size: int):
    """Binary occupancy of `points` in the four parity subgrids:
    (4, gh, gh) float32 with occ[2*(iy&1)+(ix&1), iy>>1, ix>>1] = 1.

    Replaces jnp's scatter (see _make_bit_scatter_kernel). Exact: same
    cells set, OR semantics."""
    gh = (grid_size + 1) // 2
    bits = _scatter_bits(points, valid, offset, scale, grid_size)
    nb_bits = (gh + SCAT_TC - 1) // SCAT_TC
    planes = jnp.concatenate(
        [(bits >> b) & 1 for b in range(nb_bits)], axis=2
    )
    return planes[:, :gh, :gh].astype(jnp.float32)


SMEAR_TB = 32            # output rows per smear band (= PAD_TOP; the
                         # aligned-read trick below needs this equality)


def _make_smear_kernel(gh: int, hk: int, NL: int, g_odd: bool, wp: int):
    """Banded cross-parity Gaussian max-smear + quantize, consuming the
    bit-scatter's packed bit planes directly.

    XLA materializes the 41-tap max chain as full-grid intermediates
    (~2.7 GB of HBM traffic per scan at G=2051 — measured 3.3 ms/scan,
    63% of the whole streaming batch program). This kernel keeps each
    band's working set in VMEM: unpack bits -> row-pass max (cross
    row-parity) -> col-pass max (cross col-parity) -> round(100*z) int8 ->
    padded parity layout. Total HBM traffic ~11 MB/scan.

    Exactness vs the XLA path (tested): identical 0/1 inputs, identical
    f32 weight products fl(w_k * fl(w_j * x)), max over the same tap sets
    (order-independent), identical zero boundary handling, identical
    round-half-away quantization.
    """
    WCORE = 128 * NL
    WU = WCORE + 256          # 128-lane zero halo each side for col taps

    def kern(w_ref, bits_ref, out_ref, u_ref, r_ref):
        i = pl.program_id(0)
        # out block rows are subgrid rows [q0, q0+TB); the bits array has
        # a 64-row top zero pad so the 96-row read at offset 32*i is
        # sublane-aligned and covers input rows [q0-32, q0+64)
        q0 = i * SMEAR_TB - PAD_TOP

        # unpack bit planes to 0/1 f32: cell t = 128*l + lane lives in
        # word lane, bit l (strided layout) — per 128-lane block the bit
        # index is a compile-time constant
        for p in range(4):
            rows = bits_ref[p, pl.ds(i * SMEAR_TB, 3 * SMEAR_TB), :]
            u_ref[p, :, 0:128] = jnp.zeros(
                (3 * SMEAR_TB, 128), jnp.float32
            )
            for l in range(NL):
                u_ref[p, :, 128 + 128 * l:256 + 128 * l] = (
                    (rows >> l) & 1
                ).astype(jnp.float32)
            u_ref[p, :, 128 + WCORE:WU] = jnp.zeros(
                (3 * SMEAR_TB, 128), jnp.float32
            )

        # row pass: output full row y = 2q+pr takes tap j from input
        # plane parity (pr+j)&1 at subgrid row q + ((pr+j)>>1); output
        # block row r is subgrid row q0+r, so input row u = 32 + r + sh.
        # Taps +-j share the weight (w is exactly symmetric) and the
        # source plane ((pr+j) and (pr-j) have the same parity), so each
        # pair costs one multiply: max(w*a, w*b) == w*max(a, b) bitwise
        # for w > 0 (multiplication is monotone under round-to-nearest).
        def u_slice(sp, sh):
            return u_ref[sp, 32 + sh:32 + sh + SMEAR_TB, :]

        for pr in range(2):
            for pc in range(2):
                acc = w_ref[hk] * u_slice(2 * (pr & 1) + pc, pr >> 1)
                for j in range(1, hk + 1):
                    sp = 2 * ((pr + j) & 1) + pc
                    pair = jnp.maximum(
                        u_slice(sp, (pr + j) >> 1),
                        u_slice(sp, (pr - j) >> 1),
                    )
                    acc = jnp.maximum(acc, w_ref[hk + j] * pair)
                r_ref[2 * pr + pc] = acc

        # col pass + quantize + placement at (PAD_TOP, PAD_LEFT)
        qv = q0 + jax.lax.broadcasted_iota(
            jnp.int32, (SMEAR_TB, WCORE), 0
        )
        tv = jax.lax.broadcasted_iota(jnp.int32, (SMEAR_TB, WCORE), 1)
        from slam_toolbox_tpu.kernels.rasterize import round_half_away

        def r_slice(pr, sp, csh):
            return r_ref[2 * pr + sp, :, 128 + csh:128 + csh + WCORE]

        for pr in range(2):
            for pc in range(2):
                acc = w_ref[hk] * r_slice(pr, pc & 1, pc >> 1)
                for k in range(1, hk + 1):
                    sp = (pc + k) & 1
                    pair = jnp.maximum(
                        r_slice(pr, sp, (pc + k) >> 1),
                        r_slice(pr, sp, (pc - k) >> 1),
                    )
                    acc = jnp.maximum(acc, w_ref[hk + k] * pair)
                ok = (qv >= 0) & (qv < gh) & (tv < gh)
                if g_odd and pr == 1:
                    # subgrid row gh-1 of odd row-parity = full row G (OOB)
                    ok &= qv != gh - 1
                if g_odd and pc == 1:
                    ok &= tv != gh - 1
                v8 = round_half_away(acc * 100.0).astype(jnp.int8)
                v8 = jnp.where(ok, v8, 0)
                out_ref[2 * pr + pc] = jnp.concatenate([
                    jnp.zeros((SMEAR_TB, PAD_LEFT), jnp.int8),
                    v8,
                    jnp.zeros(
                        (SMEAR_TB, wp - PAD_LEFT - WCORE), jnp.int8
                    ),
                ], axis=1)

    return kern


def smear_vmem_bytes(G: int, acc_r: int = 32) -> int:
    gh = (G + 1) // 2
    hp, _ = parity_dims(G, acc_r)
    NL = (gh + 127) // 128
    WU = 128 * NL + 256
    rpad = hp + 64
    return (4 * rpad * 128 * 4) + (4 * 96 * WU * 4) + (4 * 32 * WU * 4)


def smear_quantize_parity(bits, sigma_cells, grid_size: int,
                          half_kernel: int, acc_r: int = 32):
    """bits: the (4, rows, 128) int32 bit planes from the banded scatter
    -> (4, HP, WP) int8 quantized smeared parity grid."""
    G = grid_size
    gh = (G + 1) // 2
    hp, wp = parity_dims(G, acc_r)
    NL = (gh + 127) // 128
    n_bands = hp // SMEAR_TB
    rpad = SMEAR_TB * n_bands + 64
    assert PAD_TOP == SMEAR_TB and hp % SMEAR_TB == 0
    assert half_kernel + 1 <= 2 * SMEAR_TB and half_kernel <= 2 * 128 - 2

    k = jnp.arange(-half_kernel, half_kernel + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (k / sigma_cells) ** 2)

    bp = jnp.zeros((4, rpad, 128), jnp.int32)
    bp = jax.lax.dynamic_update_slice(bp, bits, (0, 64, 0))

    WU = 128 * NL + 256
    return pl.pallas_call(
        _make_smear_kernel(gh, half_kernel, NL, G % 2 == 1, wp),
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4, SMEAR_TB, wp), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((4, hp, wp), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((4, 3 * SMEAR_TB, WU), jnp.float32),
            pltpu.VMEM((4, SMEAR_TB, WU), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(w, bp)


def rasterize_parity(
    points, valid, offset, scale, sigma_cells,
    grid_size: int, half_kernel: int, acc_r: int = 32,
):
    """Scatter + separable Gaussian max-smear + int8 quantize DIRECTLY in
    the padded parity layout.

    Building the full (G, G) raster and then parity-splitting it costs a
    pathological int8 reshape+transpose on TPU (measured 2.7 ms/scan at
    G=2451 — more than the scoring kernel itself), so the scatter targets
    the (4, gh, gh) subgrids and the separable smear runs cross-parity:
    output row-parity pr at subgrid row q (full row 2q+pr) takes its
    max over taps j from input plane parity (pr+j)&1 at row q+((pr+j)>>1).
    The smear itself runs in the banded Pallas kernel above when its
    working set fits VMEM (the XLA tap chain costs ~3.3 ms/scan at
    G=2051; the kernel ~0.5 ms); the XLA tap chain remains as the
    fallback. Bit-exact vs
    prepare_parity_grid(quantize(rasterize_smear(...))):
    same products, same max tree, same rounding (tested).
    """
    from slam_toolbox_tpu.kernels.rasterize import round_half_away

    G = grid_size
    gh = (G + 1) // 2
    hp, wp = parity_dims(G, acc_r)

    if (
        half_kernel > 0
        and half_kernel + 1 <= 2 * SMEAR_TB
        and smear_vmem_bytes(G, acc_r) < 10 * 2**20
    ):
        bits = _scatter_bits(points, valid, offset, scale, G)
        return smear_quantize_parity(
            bits, sigma_cells, G, half_kernel, acc_r
        )

    occ = scatter_occupancy_parity(
        points, valid, offset, scale, G
    ).reshape(2, 2, gh, gh)

    if half_kernel > 0:
        k = jnp.arange(-half_kernel, half_kernel + 1, dtype=jnp.float32)
        w = jnp.exp(-0.5 * (k / sigma_cells) ** 2)  # (K,)
        ps = half_kernel // 2 + 1  # max |(pr+j)>>1| over j, pr

        def smear_axis(a, axis):
            # a: (2, 2, gh, gh); axis 2 = rows (parity dim 0), 3 = cols
            pdim = axis - 2
            pads = [(0, 0)] * 4
            pads[axis] = (ps, ps)
            ap = jnp.pad(a, pads)
            out = []
            for pr in range(2):
                # fixed output plane parity pr along this axis; iterate
                # taps, each reading a shifted slice of the source plane
                # with parity (pr+j)&1
                o = None
                for j in range(-half_kernel, half_kernel + 1):
                    sp = (pr + j) & 1
                    sh = (pr + j) >> 1
                    src = jnp.take(ap, sp, axis=pdim)
                    sl = jax.lax.slice_in_dim(
                        src, ps + sh, ps + sh + gh, axis=axis - 1
                    )
                    term = w[j + half_kernel] * sl
                    o = term if o is None else jnp.maximum(o, term)
                out.append(o)
            return jnp.stack(out, axis=pdim)

        occ = smear_axis(smear_axis(occ, 2), 3)

    if G % 2 == 1:
        # subgrid row/col gh-1 of the odd-parity planes is full row/col G
        # (out of grid): force it back to zero like the reference's
        # bounds-clipped SmearPoint
        occ = occ.at[1, :, gh - 1, :].set(0.0)
        occ = occ.at[:, 1, :, gh - 1].set(0.0)

    q8 = round_half_away(occ * 100.0).astype(jnp.int8).reshape(4, gh, gh)
    out = jnp.zeros((4, hp, wp), jnp.int8)
    return jax.lax.dynamic_update_slice(out, q8, (0, PAD_TOP, PAD_LEFT))


def prepare_tables(d, cand_x0, cand_y0, finite, G: int, acc_r: int = 32):
    """Window descriptors. d: (na, B, 2) int32 rotated offsets [dx, dy];
    cand_*0: first candidate cell (scalars); finite: (B,) bool.

    Window base = (dy + cand_y0, dx + cand_x0) in full-grid cells; rows and
    cols are floor-halved into subgrid coords and shifted by the pads.
    Clamped coordinates land in the zero border, so escaped windows
    contribute 0."""
    hp, wp = parity_dims(G, acc_r)
    read_r = acc_r + N_PHASE
    pad_bot = pad_bottom(acc_r)
    r0 = d[:, :, 1] + cand_y0
    c0 = d[:, :, 0] + cand_x0
    parity = 2 * (r0 & 1) + (c0 & 1)
    r = (r0 >> 1) + PAD_TOP   # arithmetic shift = floor for negatives
    c = (c0 >> 1) + PAD_LEFT
    # keep aligned reads inside the array; border rows/cols are zero
    r = jnp.clip(r, 0, hp - read_r - 1)
    c = jnp.clip(c, 0, wp - READ_C - 1)
    # beams clamped from far outside: reads land fully in the border
    # only if the clamp region is zero — guarantee by invalidating them
    in_range = (
        (r0 >= -2 * PAD_TOP) & (r0 < G + 2 * (pad_bot - read_r))
        & (c0 >= -2 * PAD_LEFT) & (c0 < G + 2 * (PAD_RIGHT - READ_C))
    )
    v = (finite[None, :] & in_range).astype(jnp.int32)
    # (na, 4, B): SMEM pads the trailing dim to full lanes, so keep the
    # long beam axis last. B pads to a BEAM_UNROLL multiple with v=0
    # entries (r=c=0 reads land in-bounds and contribute 0).
    tbl = jnp.stack([parity, r, c, v], axis=1).astype(jnp.int32)
    B = tbl.shape[2]
    Bp = _round_up(B, BEAM_UNROLL)
    if Bp != B:
        tbl = jnp.concatenate(
            [tbl, jnp.zeros((tbl.shape[0], 4, Bp - B), jnp.int32)], axis=2
        )
    return tbl
