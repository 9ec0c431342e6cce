"""Pallas TPU kernels for the BBME hot path.

The single hottest op in the whole framework is the DFD cost volume: for
every block of the previous frame, the block-distance (MAE/MSE of the block
difference, reference bbme.py:41-94) against the current frame at every
offset in a (D x D) window.  The XLA formulation in ``bbme.compute_cost_volume``
lowers to D*D serialized (H, W) slice+diff+reduce programs and measures ~34x
off VPU speed-of-light on a v5e.

Design notes (hardware constraints that shaped this kernel):

- Mosaic cannot vector-load VMEM at a dynamic sublane offset, and its
  dynamic sublane rotate miscompiles (measured off by one 8-row tile), so
  the row-offset windows are pre-sliced by XLA (static slices + one concat,
  pure data movement) and fed to the kernel through a pipelined BlockSpec —
  one grid step per row offset, with Pallas double-buffering the window DMA
  behind compute automatically.
- Column offsets are static lane slices, unrolled in the kernel body.
- The per-pixel |diff| / diff^2 runs on the VPU; the per-block box sums fold
  into two matmuls on the MXU against 0/1 pooling matrices built from iotas:

      cost[dr, dc] = Sr @ pnorm(window_dr[:, dc:dc+Wc] - prev) @ Sc

  with precision=HIGHEST: the MXU default truncates f32 operands to bf16,
  and per-pixel DFD terms need up to 16 mantissa bits; the 3xbf16
  decomposition keeps these integer sums (< 2**24) exact.

All DFD values are integer sums of uint8 differences over <=16x16 blocks,
exactly representable in float32, so this path is bit-identical to the
XLA/NumPy formulations (asserted in tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gme_tpu.config import MAE, MSE


def _round8(n: int) -> int:
    return (n + 7) // 8 * 8


def _pool_matrices(nbh: int, nbw: int, bs: int):
    """0/1 block-pooling matrices Sr (nbh, Hc) and Sc (Wc, nbw), built from
    2D iotas (TPU requires >=2D iota)."""
    Hc, Wc = nbh * bs, nbw * bs
    r_blk = jax.lax.broadcasted_iota(jnp.int32, (nbh, Hc), 1) // bs
    r_id = jax.lax.broadcasted_iota(jnp.int32, (nbh, Hc), 0)
    sr = (r_blk == r_id).astype(jnp.float32)
    c_blk = jax.lax.broadcasted_iota(jnp.int32, (Wc, nbw), 0) // bs
    c_id = jax.lax.broadcasted_iota(jnp.int32, (Wc, nbw), 1)
    sc = (c_blk == c_id).astype(jnp.float32)
    return sr, sc


def _exact_dot(a, b):
    return jnp.dot(
        a,
        b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _cross_volume_kernel(prev_ref, win_ref, out_ref, t_ref, *, bs, D, T, nbw):
    """Cross-correlation volume kernel — the MSE-decomposition hot loop.

    Identical structure to `_cost_volume_kernel` but computes
    ``cross[dr, dc, t, j] = sum_block prev * window`` (ONE multiply per
    element instead of subtract + square): with uint8-valued frames,
    ``sum (a-b)^2 = sum a^2 - 2*sum a*b + sum b^2`` where the squared terms
    are offset-independent (computed once by XLA box sums in
    `_dfd_cost_volume_mse_decomp`), so only the cross term pays the D^2
    elementwise sweep.  All sums are integers < 2**24 (bs <= 16 dispatch
    guard): exact in f32 and under the HIGHEST-precision pooling matmul.
    """
    Wc = nbw * bs
    sr, sc = _pool_matrices(T, nbw, bs)
    prev = prev_ref[...]  # (T*bs, Wc)
    rows = win_ref[0]  # (T*bs, Wc + D - 1)
    for dc in range(D):
        prod = rows[:, dc : dc + Wc] * prev
        if bs < 8:
            t_ref[dc * T : (dc + 1) * T, :] = _exact_dot(sr, prod)
        else:
            t_ref[dc * T : (dc + 1) * T, :] = prod.reshape(T, bs, Wc).sum(
                axis=1
            )
    out_ref[0, 0] = _exact_dot(t_ref[...], sc)


def _cost_volume_kernel(
    prev_ref, win_ref, out_ref, t_ref, *, bs, D, pnorm, T, nbw
):
    Wc = nbw * bs
    sr, sc = _pool_matrices(T, nbw, bs)
    prev = prev_ref[...]  # (T*bs, Wc), zero-padded past the real rows
    rows = win_ref[0]  # (T*bs, Wc + D - 1): this tile's window, this row offset
    for dc in range(D):  # static unroll: lane slices at known offsets
        diff = rows[:, dc : dc + Wc] - prev
        per_px = jnp.abs(diff) if pnorm == MAE else diff * diff
        if bs < 8:
            # Sub-tile block edge: the strided (T, bs, Wc) sublane reduction
            # lowers to masked rotates whose stack temporaries Mosaic does
            # NOT reuse across the unrolled dc iterations (measured 36MB of
            # scoped vmem at 720p).  Pool rows on the MXU instead — one
            # (T, T*bs) 0/1 matrix, full-tile accesses only.
            t_ref[dc * T : (dc + 1) * T, :] = _exact_dot(sr, per_px)
        else:
            # Row pooling on the VPU: aligned sublane-split reshape + sum.
            # T is 8-aligned so every scratch store is a full aligned tile
            # (unaligned masked stores here cost ~20x in Mosaic compile time).
            t_ref[dc * T : (dc + 1) * T, :] = per_px.reshape(T, bs, Wc).sum(
                axis=1
            )
    # Column pooling as ONE tall MXU matmul (M = D*T keeps the systolic
    # array fed; a per-dc (T, Wc) @ (Wc, nbw) dot would run at T/128
    # utilization).
    out_ref[0, 0] = _exact_dot(t_ref[...], sc)


def _planes_kernel(
    prev_ref, win_ref, out_ref, t_ref, *, bs, D, pnorm, T, nbw, G, PR8
):
    """Chunked cost-volume kernel for sub-tile block edges (bs < 8): G row
    offsets per grid step, with rows pre-split into bs residue planes so the
    per-offset row pool is a sum of bs *aligned* full-tile plane diffs.

    Motivation (measured on v5e): the one-offset-per-step kernel pays a fixed
    ~5-10us grid-step cost, which dominates at small frames — the dense bs=2
    init at 720p (180x320, D=33) ran 1056 grid steps per 8-pair batch
    (~10.7 ms/pair) against a ~0.3 ms/pair VPU floor.  Chunking G=8 offsets
    per step cuts the step count 8x; the plane split keeps every access
    tile-aligned (a direct ``win[g:g+T*bs]`` slice at g % 8 != 0 lowers to
    masked sublane rotates that measured SLOWER than the unchunked kernel).

    Row-offset math (G % bs == 0 so chunk bases land on plane boundaries):
    for row offset dr = c*G + g, prev plane p pairs with curr plane
    u = (g+p) % bs at plane-row base (g+p)//bs within this chunk's window.
    """
    Wc = nbw * bs
    _, sc = _pool_matrices(T, nbw, bs)
    prev = prev_ref[0]  # (bs*T, Wc): plane p at rows [p*T, (p+1)*T)
    win = win_ref[0, 0]  # (bs*PR8, Wp): plane u at rows [u*PR8, (u+1)*PR8)
    for g in range(G):
        planes = []
        for p in range(bs):
            u = (g + p) % bs
            base = (g + p) // bs
            planes.append(
                (
                    win[u * PR8 + base : u * PR8 + base + T, :],
                    prev[p * T : (p + 1) * T, :],
                )
            )
        for dc in range(D):
            acc = None
            for wp, pp in planes:
                diff = wp[:, dc : dc + Wc] - pp
                per_px = jnp.abs(diff) if pnorm == MAE else diff * diff
                acc = per_px if acc is None else acc + per_px
            t_ref[dc * T : (dc + 1) * T, :] = acc
        out_ref[0, 0, g * D * T : (g + 1) * D * T, :] = _exact_dot(
            t_ref[...], sc
        )


_HANKEL_CP = 128  # padded c' width: one f32 lane tile, legal reshape minor


def _hankel_E(bs: int, D: int) -> jnp.ndarray:
    """Toeplitz selection matrix E[c, dc*CP + c'] = [c' - dc == c] (bf16).

    Right-multiplying a (rows, bs) stack of prev-block row chunks by E
    expands each bs-vector into its (D, CP) Toeplitz band on the MXU —
    exact, because every output entry is a single 0/1-weighted product."""
    c = jax.lax.broadcasted_iota(jnp.int32, (bs, D, _HANKEL_CP), 0)
    dc = jax.lax.broadcasted_iota(jnp.int32, (bs, D, _HANKEL_CP), 1)
    cp = jax.lax.broadcasted_iota(jnp.int32, (bs, D, _HANKEL_CP), 2)
    return (cp - dc == c).astype(jnp.bfloat16).reshape(bs, D * _HANKEL_CP)


def _slide_sum_rows(x: jnp.ndarray, n: int, out_len: int) -> jnp.ndarray:
    """In-kernel sliding sum over leading (sublane) dim: out[i] = sum of
    x[i : i + n], via a log tree of static slices (exact for integer f32)."""
    sums = {1: x}
    p = 1
    while 2 * p <= n:
        a = sums[p]
        sums[2 * p] = a[: a.shape[0] - p] + a[p:]
        p *= 2
    out = None
    off = 0
    while p >= 1:
        if n & p:
            part = sums[p][off : off + out_len]
            out = part if out is None else out + part
            off += p
        p //= 2
    return out


def _slide_sum_lanes(x: jnp.ndarray, n: int, out_len: int) -> jnp.ndarray:
    """Sliding sum over the minor (lane) dim, same log-tree construction."""
    sums = {1: x}
    p = 1
    while 2 * p <= n:
        a = sums[p]
        sums[2 * p] = a[:, : a.shape[1] - p] + a[:, p:]
        p *= 2
    out = None
    off = 0
    while p >= 1:
        if n & p:
            part = sums[p][:, off : off + out_len]
            out = part if out is None else out + part
            off += p
        p //= 2
    return out


def _hankel_mse_kernel(
    prevT_ref, sb_ref, win_ref, e_ref, out_ref, w3_ref, ps_ref,
    *, bs, D, nbw, Wpad, Jc
):
    """MXU cost-volume kernel: full MSE via the cross decomposition with the
    D^2 sweep as per-block matmuls (see `_dfd_cost_volume_hankel`)."""
    CP = _HANKEL_CP
    win = win_ref[0]  # (bs + D - 1, Wpad) bf16
    # Hankel scratch: W3[r, dr, x] = win[dr + r, x] (bs static sublane
    # slices; each is a contiguous 2D copy).
    for r in range(bs):
        w3_ref[r] = win[r : r + D, :]
    # sum-a^2 term: sliding bs x bs box sums of curr^2 at every (dr, x).
    winf = win.astype(jnp.float32)
    rowsum = _slide_sum_rows(winf * winf, bs, D)       # (D, Wpad)
    sa_full = _slide_sum_lanes(rowsum, bs, Wpad - bs + 1)
    e = e_ref[...]
    prevT = prevT_ref[0]  # (nbw*bs, bs): rows (j*bs + r) = prev[r, j*bs + c]
    for ch in range(nbw // Jc):
        pc = prevT[ch * Jc * bs : (ch + 1) * Jc * bs, :]
        # Toeplitz expansion of Jc prev blocks in ONE MXU matmul; bf16 cast
        # exact (values <= 255).
        ps_ref[...] = jnp.dot(
            pc, e, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        for jl in range(Jc):
            j = ch * Jc + jl
            ps3 = ps_ref[jl * bs : (jl + 1) * bs, :].reshape(bs, D, CP)
            wj = w3_ref[:, :, j * bs : j * bs + CP]
            cross = jax.lax.dot_general(
                wj, ps3, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (bs_r, D, D) batched over r
            sa_j = sa_full[:, j * bs : j * bs + D]  # (D_dr, D_dc)
            out_ref[0, j] = (
                sa_j - 2.0 * jnp.sum(cross, axis=0) + sb_ref[0, 0, j]
            )


def _dfd_cost_volume_hankel(
    prev_crop: jnp.ndarray,
    curr_pad: jnp.ndarray,
    bs: int,
    D: int,
    interpret: bool,
) -> jnp.ndarray:
    """MSE cost volume on the MXU — the bs >= 8 production path.

    The D^2 elementwise sweep (the framework's hottest loop, reference
    bbme.py:41-94) runs at VPU speed of light in the row-offset kernels
    (~14 ms/pair at 720p level 2); only the MXU has more throughput.  Per
    block, the cross term of sum (a-b)^2 = sum a^2 - 2ab + b^2 is a
    correlation, and a correlation IS a matmul against a Toeplitz operand:

        cross[dr, dc] = sum_{r, c'} W[r, dr, c'] * P[r, dc, c']
        W[r, dr, c']  = curr[t*bs + dr + r, j*bs + c']   (Hankel of curr)
        P[r, dc, c']  = prev[t*bs + r, j*bs + (c'-dc)]   (Toeplitz of prev)

    contracted on the MXU as an r-batched (D, CP) x (D, CP) dot_general.
    The Toeplitz operands are themselves built on the MXU: one selection
    matmul `prev_chunk @ E` expands Jc blocks at a time (`_hankel_E`).  The
    offset-independent squared terms fold in per block row: sum a^2 is an
    in-kernel sliding box sum of curr^2, sum b^2 a tiny XLA block pooling.

    Exactness: uint8 frame values are exact in bf16 (8-bit mantissa);
    products are f32-accumulated; every sum stays < 2**24 (bs <= 16 guard),
    and |sa - 2*cross| <= bs^2 * 255^2 < 2**24 keeps the combine exact —
    bit-identical to the subtract-square oracles (tests/test_pallas.py).
    """
    CP = _HANKEL_CP
    Hc, Wc = prev_crop.shape
    nbh, nbw = Hc // bs, Wc // bs
    K = bs + D - 1
    Wpad = Wc + CP
    assert curr_pad.shape == (Hc + D - 1, Wc + D - 1)
    assert K <= CP
    Jc = max(1, min(16, nbw))
    while nbw % Jc:
        Jc -= 1
    # prevT rows (j*bs + r) = prev[t*bs + r, j*bs : (j+1)*bs].
    prevT = (
        prev_crop.astype(jnp.bfloat16)
        .reshape(nbh, bs, nbw, bs)
        .transpose(0, 2, 1, 3)
        .reshape(nbh, nbw * bs, bs)
    )
    pf = prev_crop.astype(jnp.float32)
    sb = (pf * pf).reshape(nbh, bs, nbw, bs).sum(axis=(1, 3))[:, None, :]
    cb = jnp.pad(
        curr_pad.astype(jnp.bfloat16),
        ((0, 0), (0, Wpad - curr_pad.shape[1])),
    )
    wins = jnp.stack([cb[t * bs : t * bs + K] for t in range(nbh)])
    E = _hankel_E(bs, D)
    kernel = functools.partial(
        _hankel_mse_kernel, bs=bs, D=D, nbw=nbw, Wpad=Wpad, Jc=Jc
    )
    out = pl.pallas_call(
        kernel,
        grid=(nbh,),
        in_specs=[
            pl.BlockSpec((1, nbw * bs, bs), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nbw), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, Wpad), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, D * CP), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nbw, D, D), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbh, nbw, D, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bs, D, Wpad), jnp.bfloat16),
            pltpu.VMEM((Jc * bs, D * CP), jnp.bfloat16),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_PLANES_VMEM_LIMIT
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nbh * nbw * bs * D * CP * (bs + D),
            bytes_accessed=2 * nbh * (bs + K) * Wpad + 4 * nbh * nbw * D * D,
            transcendentals=0,
        ),
    )(prevT, sb, wins, E)
    return out.transpose(2, 3, 0, 1)


_PLANES_VMEM_LIMIT = 64 * 2**20


def _pick_plane_tile(nbh8: int, bs: int, G: int, Wc: int, D: int, nbw: int) -> int:
    """Largest 8-aligned block-row tile T for the planes kernel under the
    VMEM budget (double-buffered prev/window/out blocks + scratch).

    Mosaic gives the unrolled per-(g, dc) temporaries distinct stack slots
    (measured ~2.3x the accounted block+scratch bytes at bs=2), so the
    accounted budget is ~1/3 of `_PLANES_VMEM_LIMIT` (the kernel raises the
    scoped limit via CompilerParams — v5e VMEM is 128 MiB)."""
    budget = 20 * 2**20
    Wp = Wc + D - 1
    T = 8
    for cand in range(8, nbh8 + 8, 8):
        PR8 = _round8(cand + G // bs + 1)
        vmem = 4 * (
            2 * bs * cand * Wc  # prev planes block, double-buffered
            + 2 * bs * PR8 * Wp  # window planes block
            + 2 * G * D * cand * nbw  # out block
            + D * cand * Wc  # scratch
        )
        if vmem <= budget:
            T = cand
        else:
            break
    return min(T, nbh8)


def _dfd_cost_volume_planes(
    prev_crop: jnp.ndarray,
    curr_pad: jnp.ndarray,
    bs: int,
    D: int,
    pnorm: int,
    G: int,
    interpret: bool,
) -> jnp.ndarray:
    """Chunked planes path of `dfd_cost_volume` (bs < 8, 8 % bs == 0).

    XLA-side prep: split curr rows into bs residue planes (plane u = rows
    u, u+bs, ...), then stack per-(chunk, tile) windows so every kernel
    access is a static aligned slice.  Bit-identical to the unchunked
    kernel and the XLA/NumPy oracles (tests/test_pallas.py)."""
    Hc, Wc = prev_crop.shape
    nbh, nbw = Hc // bs, Wc // bs
    nbh8 = _round8(nbh)
    T = _pick_plane_tile(nbh8, bs, G, Wc, D, nbw)
    num_tiles = -(-nbh8 // T)
    nbhp = num_tiles * T
    Hp = nbhp * bs
    Dc = -(-D // G)
    Wp = Wc + D - 1
    prev_p = jnp.pad(prev_crop.astype(jnp.float32), ((0, Hp - Hc), (0, 0)))
    PR8 = _round8(T + G // bs + 1)
    # Plane u of curr holds rows u, u+bs, ...; chunk c tile rt reads plane
    # rows [rt*T + c*(G//bs), rt*T + c*(G//bs) + PR8).
    max_plane_rows = (num_tiles - 1) * T + (Dc - 1) * (G // bs) + PR8
    curr_f = jnp.pad(
        curr_pad.astype(jnp.float32),
        ((0, max(0, max_plane_rows * bs + bs - curr_pad.shape[0])), (0, 0)),
    )
    planes = [curr_f[u::bs] for u in range(bs)]
    wchunks = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.concatenate(
                        [
                            planes[u][
                                rt * T + c * (G // bs) : rt * T + c * (G // bs) + PR8
                            ]
                            for u in range(bs)
                        ],
                        axis=0,
                    )
                    for rt in range(num_tiles)
                ]
            )
            for c in range(Dc)
        ]
    )  # (Dc, tiles, bs*PR8, Wp)
    # Prev planes: (tiles, bs*T, Wc) with plane p at rows [p*T, (p+1)*T).
    prev_arr = (
        prev_p.reshape(num_tiles, T, bs, Wc)
        .transpose(0, 2, 1, 3)
        .reshape(num_tiles, bs * T, Wc)
    )
    kernel = functools.partial(
        _planes_kernel, bs=bs, D=D, pnorm=pnorm, T=T, nbw=nbw, G=G, PR8=PR8
    )
    out = pl.pallas_call(
        kernel,
        grid=(num_tiles, Dc),
        in_specs=[
            pl.BlockSpec(
                (1, bs * T, Wc), lambda rt, c: (rt, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, bs * PR8, Wp),
                lambda rt, c: (c, rt, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, G * D * T, nbw),
            lambda rt, c: (c, rt, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (Dc, num_tiles, G * D * T, nbw), jnp.float32
        ),
        scratch_shapes=[pltpu.VMEM((D * T, Wc), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_PLANES_VMEM_LIMIT
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * D * D * Hp * Wc,
            bytes_accessed=4 * (Hp * Wc + D * Hp * Wp + D * D * nbh * nbw),
            transcendentals=0,
        ),
    )(prev_arr, wchunks)
    # (Dc, tiles, G*D*T, nbw) -> (Dc, G, D, tiles, T, nbw) -> crop padding.
    out = out.reshape(Dc, num_tiles, G, D, T, nbw).transpose(0, 2, 3, 1, 4, 5)
    return out.reshape(Dc * G, D, nbhp, nbw)[:D, :, :nbh, :]


def _box_sum(x: jnp.ndarray, n: int, axis: int) -> jnp.ndarray:
    """Sliding-window sum of width n along `axis` via log-tree shifted adds:
    out[i] = sum_{k<n} x[i+k], output length = len - n + 1.  Integer-valued
    f32 inputs stay exact while partial sums remain < 2**24."""
    sums = {1: x}
    p = 1
    while 2 * p <= n:
        prev = sums[p]
        L = prev.shape[axis]
        sums[2 * p] = jax.lax.slice_in_dim(
            prev, 0, L - p, axis=axis
        ) + jax.lax.slice_in_dim(prev, p, L, axis=axis)
        p *= 2
    out = None
    off = 0
    Lout = x.shape[axis] - n + 1
    while p >= 1:
        if n & p:
            part = jax.lax.slice_in_dim(sums[p], off, off + Lout, axis=axis)
            out = part if out is None else out + part
            off += p
        p //= 2
    return out


def _dfd_cost_volume_mse_decomp(
    prev_crop: jnp.ndarray,
    curr_pad: jnp.ndarray,
    bs: int,
    D: int,
    interpret: bool,
) -> jnp.ndarray:
    """MSE volume via the cross-correlation decomposition (bs in [8, 16]).

    sum_block (a - b)^2 = sum a^2 - 2 sum a*b + sum b^2 with a = the shifted
    current-frame block and b = the anchor block: only the cross term
    depends on the offset per pixel, so the D^2 elementwise sweep (the
    framework's single hottest loop, reference bbme.py:41-94) drops from
    subtract+square to ONE multiply per element.  The squared terms are
    offset-independent: sum b^2 is one block pooling of prev^2, and
    sum a^2 at offset (dr, dc) is a sliding box sum of curr^2 evaluated at
    (t*bs+dr, j*bs+dc) — computed once over the padded frame by `_box_sum`
    log-trees and relayouted into volume layout with strided slices.

    Exactness: frames are uint8-valued, so every term is an integer —
    products <= 255^2, box/cross sums <= bs^2 * 255^2 < 2**24 (dispatch
    guard), and the final combine's intermediates stay < 2**25 — all exactly
    representable in f32.  Bit-identical to the direct kernels and the
    XLA/NumPy oracles (tests/test_pallas.py).
    """
    Hc, Wc = prev_crop.shape
    nbh, nbw = Hc // bs, Wc // bs
    prev_f = prev_crop.astype(jnp.float32)
    curr_f = curr_pad.astype(jnp.float32)

    # Offset-independent terms.
    sb = (prev_f * prev_f).reshape(nbh, bs, nbw, bs).sum(axis=(1, 3))
    sa_full = _box_sum(_box_sum(curr_f * curr_f, bs, 0), bs, 1)
    # Relayout to volume layout: SA[dr, dc, t, j] = sa_full[t*bs+dr, j*bs+dc].
    sa_rows = jnp.stack(
        [sa_full[dr :: bs][:nbh] for dr in range(D)]
    )  # (D, nbh, Wfull)
    sa_vol = jnp.stack(
        [sa_rows[:, :, dc :: bs][..., :nbw] for dc in range(D)], axis=1
    )  # (D, D, nbh, nbw)

    cross = _dfd_cost_volume_rowoffset(
        prev_f, curr_f, bs, D, MSE, interpret, cross=True
    )
    return sa_vol - 2.0 * cross + sb[None, None]


def _pick_tile_rows(nbh8: int, bs: int, Wc: int, D: int, nbw: int) -> int:
    """Largest 8-aligned block-row tile T whose VMEM footprint (double-
    buffered prev + window + out blocks, plus the (D*T, Wc) scratch) fits a
    conservative budget under the 16MB scoped-vmem limit.  Small frames get
    T = nbh8 (single tile — the original untiled kernel); 720p+ frames tile
    so the kernel fits at any resolution."""
    budget = 10 * 2**20  # bytes
    T = 8
    for cand in range(8, nbh8 + 8, 8):
        vmem = 4 * (
            2 * cand * bs * Wc  # prev block, double-buffered
            + 2 * cand * bs * (Wc + D - 1)  # window block
            + 2 * D * cand * nbw  # out block
            + D * cand * Wc  # scratch
        )
        if bs < 8:
            # Empirical Mosaic behaviour (measured on v5e): for sub-tile
            # block edges the per-dc temporaries (~3 buffers of (T*bs, Wc))
            # get distinct stack slots across the unrolled loop instead of
            # being reused, so they scale with D and must be budgeted.
            vmem += 4 * D * 3 * cand * bs * Wc
        if vmem <= budget:
            T = cand
        else:
            break
    return min(T, nbh8)


@functools.partial(
    jax.jit, static_argnames=("block_size", "n_offsets", "pnorm", "interpret")
)
def dfd_cost_volume(
    prev_crop: jnp.ndarray,
    curr_pad: jnp.ndarray,
    block_size: int,
    n_offsets: int,
    pnorm: int = MSE,
    interpret: bool = False,
) -> jnp.ndarray:
    """(D, D, nbh, nbw) DFD cost volume over a D x D offset window.

    Args:
        prev_crop: (Hc, Wc) float32, Hc/Wc multiples of block_size — the
            anchor frame cropped to whole blocks.
        curr_pad: (Hc + D - 1, Wc + D - 1) float32 — the current frame,
            padded/cropped by the caller so the window for offset index
            (i, j) is ``curr_pad[i:i+Hc, j:j+Wc]``.
        block_size: block edge (reference bbme.py:12-19 block_size).
        n_offsets: D, offsets per axis.
        pnorm: MAE (sum |diff|) or MSE (sum diff^2), reference bbme.py:67-94.

    Returns:
        (D, D, nbh, nbw) float32, entry [i, j] = DFD of every block at row
        offset i, column offset j (no validity masking — caller applies it).
    """
    if pnorm not in (MAE, MSE):
        raise ValueError(f"unknown pnorm index {pnorm}")
    bs, D = block_size, n_offsets
    Hc, Wc = prev_crop.shape
    nbh, nbw = Hc // bs, Wc // bs
    assert curr_pad.shape == (Hc + D - 1, Wc + D - 1), (
        curr_pad.shape,
        (Hc + D - 1, Wc + D - 1),
    )
    if bs < 8 and 8 % bs == 0 and D >= 8:
        # Sub-tile block edges: the chunked planes kernel (8 row offsets per
        # grid step, aligned plane slices) — the one-offset-per-step kernel's
        # fixed grid-step cost dominates at these shapes.
        return _dfd_cost_volume_planes(
            prev_crop, curr_pad, bs, D, pnorm, 8, interpret
        )
    if pnorm == MSE and bs >= 8 and bs * bs * 255 * 255 < 2**24 and D >= 8:
        if bs + D - 1 <= _HANKEL_CP:
            # MXU path: Hankel x Toeplitz batched matmuls (see
            # `_dfd_cost_volume_hankel`) — ~2.3x the VPU sweep at 720p.
            return _dfd_cost_volume_hankel(prev_crop, curr_pad, bs, D, interpret)
        # MSE cross-correlation decomposition: 1 multiply/element in the
        # D^2 sweep instead of subtract+square (exact — see the docstring).
        return _dfd_cost_volume_mse_decomp(
            prev_crop, curr_pad, bs, D, interpret
        )
    return _dfd_cost_volume_rowoffset(
        prev_crop, curr_pad, bs, D, pnorm, interpret
    )


def _dfd_cost_volume_rowoffset(
    prev_crop: jnp.ndarray,
    curr_pad: jnp.ndarray,
    bs: int,
    D: int,
    pnorm: int,
    interpret: bool,
    cross: bool = False,
) -> jnp.ndarray:
    """One-row-offset-per-grid-step kernel (the bs >= 8 path).  With
    ``cross=True`` the kernel computes the block cross-correlation volume
    (`_cross_volume_kernel`) instead of the DFD."""
    Hc, Wc = prev_crop.shape
    nbh, nbw = Hc // bs, Wc // bs
    # Tile the block rows: T block rows per grid step, T chosen so the VMEM
    # working set fits the scoped limit at any frame size (720p+ included).
    # Padded blocks (zero rows in BOTH frames) produce exactly-zero pooled
    # sums, dropped at the end; every kernel memory access stays tile-aligned.
    nbh8 = _round8(nbh)
    T = _pick_tile_rows(nbh8, bs, Wc, D, nbw)
    num_tiles = -(-nbh8 // T)
    nbhp = num_tiles * T
    Hp = nbhp * bs
    prev_p = jnp.pad(prev_crop.astype(jnp.float32), ((0, Hp - Hc), (0, 0)))
    curr_f = jnp.pad(
        curr_pad.astype(jnp.float32),
        ((0, Hp + D - 1 - curr_pad.shape[0]), (0, 0)),
    )
    # Row-offset windows, pre-sliced by XLA (static slices, one concat);
    # windows[dr, rt*T*bs : (rt+1)*T*bs] is tile rt's window at row offset dr,
    # a block-aligned slice the BlockSpec below can address directly.
    windows = jnp.stack([curr_f[dr : dr + Hp] for dr in range(D)])

    if cross:
        kernel = functools.partial(
            _cross_volume_kernel, bs=bs, D=D, T=T, nbw=nbw
        )
    else:
        kernel = functools.partial(
            _cost_volume_kernel, bs=bs, D=D, pnorm=pnorm, T=T, nbw=nbw
        )
    # Grid order (rt, dr): dr fastest, so the prev block (a function of rt
    # only) is DMA'd once per tile and reused across all D row offsets.
    out = pl.pallas_call(
        kernel,
        grid=(num_tiles, D),
        in_specs=[
            pl.BlockSpec(
                (T * bs, Wc), lambda rt, dr: (rt, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, T * bs, Wc + D - 1),
                lambda rt, dr: (dr, rt, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, D * T, nbw),
            lambda rt, dr: (dr, rt, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((D, num_tiles, D * T, nbw), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D * T, Wc), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * D * D * Hp * Wc,
            bytes_accessed=4 * (Hp * Wc + D * Hp * (Wc + D - 1) + D * D * nbh * nbw),
            transcendentals=0,
        ),
    )(prev_p, windows)
    # (D, num_tiles, D*T, nbw) -> (D, D, nbhp, nbw), drop alignment padding.
    out = out.reshape(D, num_tiles, D, T, nbw).transpose(0, 2, 1, 3, 4)
    return out.reshape(D, D, nbhp, nbw)[:, :, :nbh, :]


def _warp_kernel(idx_ref, cols_ref, frame_ref, out_ref, *, bs, H, W, nbw, G):
    """Block-warp kernel body: two one-hot MXU matmuls per block row.

    The block-constant motion field makes the warp a per-block 2D window
    copy at an arbitrary pixel offset — a gather XLA lowers element-wise on
    TPU, and Mosaic cannot vector-load VMEM at dynamic sublane offsets.  But
    selection is matmul: with the (clipped) source row index per output
    (block-column, intra-row) pair precomputed as ``rows_full`` (Wp,), the
    transposed one-hot ``Rt[h, f] = [h == rows_full[f]]`` turns the row
    gather into ``G = Rt^T @ frame`` on the MXU (each output picks exactly
    ONE frame value — exact in bf16, frame values are 0..255 integers), and
    the column selection is a second batched one-hot matmul per block
    column.  Out-of-frame sources are clipped here and masked by the caller
    (reference keeps the original pixel, motion.py:311-318).
    """
    Wp = nbw * bs
    h_iota = jax.lax.broadcasted_iota(jnp.int32, (Wp, H), 1)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (nbw, W, bs), 1)

    # G block rows per grid step: the per-step pipeline overhead dominated
    # the one-row version (measured ~100us/step against ~25us of matmul
    # work).  fori_loop (not a Python unroll) so Mosaic reuses the
    # iteration's large temporaries instead of stacking G copies (an
    # unrolled variant measured 18.4MB of scoped vmem at 720p).
    def body(gi, _):
        # (Wp, 1) source-row per (bc, i) pair — shipped lane-padded from
        # XLA so the one-hot builds in the (Wp, H) layout directly and the
        # row-select matmul contracts lhs dim1 x rhs dim0 (the natural MXU
        # form; a transposed-lhs contraction measured ~4x slower).
        rows = idx_ref[gi][:, 0:1]
        # R[f, h] = (h == rows_full[f]).
        rsel = (h_iota == rows).astype(jnp.bfloat16)
        # Grow[f, c] = frame[rows_full[f], c]  — (Wp, W), exact (one-hot
        # rows pick a single 0..255 value; Mosaic requires a 32-bit
        # accumulator, the bf16 downcast of integers <= 255 is exact).
        grow = jax.lax.dot_general(
            rsel,
            frame_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gb = grow.astype(jnp.bfloat16).reshape(nbw, bs, W)
        # C[bc, c, j] = (c == cols_full[bc, j]) — cols arrive pre-shaped
        # (nbw, bs) from XLA (a lane->sublane reshape Mosaic cannot lower).
        ctgt = cols_ref[gi][:, None, :]  # (nbw, 1, bs)
        csel = (c_iota == ctgt).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            gb,
            csel,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (nbw, bs_i, bs_j)
        out_ref[gi] = out.reshape(Wp, bs)
        return 0

    jax.lax.fori_loop(0, G, body, 0)


@functools.partial(jax.jit, static_argnames=("bs", "interpret"))
def warp_block_field(
    frame: jnp.ndarray,
    d: jnp.ndarray,
    bs: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(cov_h, cov_w) warped pixels for a block-constant motion field.

    Pallas TPU replacement for the per-pixel warp gather (reference
    motion.py:289-321 does this as a Python per-pixel loop; the previous
    MXU formulation materialized a (cov_h, W) row gather per block COLUMN —
    ~300 MB of intermediates at 720p, measured 4.4 ms/pair).  Here the
    frame stays VMEM-resident across the (nbh,) grid and each block row
    costs two exact one-hot matmuls — HBM traffic is one frame read + one
    output write.

    Source indices are clipped into the frame; the caller applies the
    reference's OOB-keeps-original mask (motion.py:311-318).  Bit-identical
    to the gather formulation for in-frame sources (tests/test_warp.py).

    Args:
        frame: (H, W) uint8.
        d: (nbh, nbw, 2) int32; channel 0 = column shift, 1 = row shift.

    Returns:
        (nbh*bs, nbw*bs) uint8 warped pixels (clipped-source values at
        OOB positions — caller masks them).
    """
    H, W = frame.shape
    nbh, nbw = d.shape[:2]
    Wp = nbw * bs
    dy = d[..., 1].astype(jnp.int32)  # row shift
    dx = d[..., 0].astype(jnp.int32)  # column shift
    f = jnp.arange(Wp, dtype=jnp.int32)
    bc = f // bs
    k = f % bs
    br = jnp.arange(nbh, dtype=jnp.int32)[:, None]
    rows_full = jnp.clip(br * bs + k[None, :] - dy[:, bc], 0, H - 1)
    cols_full = jnp.clip(f[None, :] - dx[:, bc], 0, W - 1)
    # Rows ship as a lane-padded COLUMN (nbh, Wp, 8) so the kernel reads a
    # (Wp, 1) vector without any lane->sublane relayout (Mosaic cannot
    # lower those); cols ship pre-split as (nbw, bs) for the same reason.
    # Blocks with a trailing dim equal to the array's trailing dim satisfy
    # the (8, 128) tiling rule.
    idx = jnp.pad(rows_full[:, :, None], ((0, 0), (0, 0), (0, 7)))
    cols3 = cols_full.reshape(nbh, nbw, bs)
    # Block-row chunk per grid step: largest divisor of nbh within the VMEM
    # budget (buffers are reused across the in-kernel unroll, so G only
    # scales the out block).
    G = max((g for g in range(1, 10) if nbh % g == 0))

    out = pl.pallas_call(
        functools.partial(_warp_kernel, bs=bs, H=H, W=W, nbw=nbw, G=G),
        grid=(nbh // G,),
        in_specs=[
            pl.BlockSpec(
                (G, Wp, 8), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (G, nbw, bs), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            # Whole frame, index map constant: DMA'd once, VMEM-resident.
            pl.BlockSpec((H, W), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (G, Wp, bs), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nbh, Wp, bs), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # One iteration's temporaries (one-hot, f32 row-select product,
            # bf16 copies) plus pipeline double-buffers exceed the default
            # 16 MiB scoped budget at 720p; v5e VMEM is 128 MiB.
            vmem_limit_bytes=_PLANES_VMEM_LIMIT
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nbh * Wp * W * (H + bs),
            bytes_accessed=2 * H * W + 4 * nbh * Wp * bs,
            transcendentals=0,
        ),
    )(idx, cols3, frame.astype(jnp.bfloat16))
    # (nbh, nbw*bs_i, bs_j) -> (cov_h, cov_w)
    out = out.reshape(nbh, nbw, bs, bs).transpose(0, 2, 1, 3)
    return out.reshape(nbh * bs, nbw * bs).astype(frame.dtype)


# LDSP candidate offsets in reference scan order (bbme._LDSP; duplicated
# here because bbme imports this module).
_CHASE_LDSP = (
    (0, 0), (2, 0), (1, 1), (0, 2), (-1, 1),
    (-2, 0), (-1, -1), (0, -2), (1, -1),
)


def _chase_kernel(map_ref, bnd_ref, out_ref, *, D, R, max_iters, ldsp):
    """Fixpoint pointer chase for one chunk of cells, map VMEM-resident.

    The XLA lockstep chase re-reads the (cells, D^2) successor map from HBM
    with widened mask/select intermediates on EVERY while iteration
    (measured ~45x below VPU throughput).  Here the chunk's map loads into
    VMEM once, every sweep runs at VPU speed, and each chunk exits as soon
    as ITS cells converge (interior chunks stop in a few iterations while
    frame-edge chunks slide longer — the lockstep XLA loop pays the max
    over all cells).

    Per-cell state is a (Tc, 1) column; the rank lookup is the same masked
    one-hot sweep as the XLA path (exactly one lane matches), and the move
    decode is a 9-way select against the LDSP table.  Bit-identical to the
    XLA chase (asserted in tests/test_pallas.py).
    """
    # Cells live on LANES: the map arrives transposed (DD, Tc) so every
    # per-cell state is a (1, Tc) row vector — the layout Mosaic handles
    # robustly in loop carries ((Tc, 1) column carries tripped "invalid
    # relayout: replicated destination" on the while back-edge).
    Tc = map_ref.shape[1]
    mapv = map_ref[...].astype(jnp.float32)  # (DD, Tc), VMEM-resident
    iota = jax.lax.broadcasted_iota(jnp.int32, mapv.shape, 0)
    lo_r = bnd_ref[0:1, :]
    hi_r = bnd_ref[1:2, :]
    lo_c = bnd_ref[2:3, :]
    hi_c = bnd_ref[3:4, :]
    o0 = jnp.full((1, Tc), R * D + R, jnp.int32)

    def rank_at(o):
        hit = iota == o  # (1, Tc) broadcasts over the DD sublanes
        # Exactly one sublane matches; f32 sum of values <= 8 is exact.
        return jnp.sum(
            jnp.where(hit, mapv, 0.0), axis=0, keepdims=True
        ).astype(jnp.int32)

    def sel9(k, table):
        out = jnp.zeros_like(k)
        for i, v in enumerate(table):
            out = jnp.where(k == i, jnp.int32(v), out)
        return out

    # Ring-visit accumulation goes through the OUTPUT REF, not a loop
    # carry: an extra (1, Tc) int32 while-carry tripped Mosaic's layout
    # inference ("invalid relayout: replicated destination") regardless of
    # how it was initialised; ref mutation inside the body sidesteps the
    # carry-layout unification entirely.
    out_ref[...] = jnp.zeros((8, Tc), jnp.int32)

    def body(state):
        o, _, it = state
        omax = jnp.maximum(jnp.abs(o // D - R), jnp.abs(o % D - R))
        out_ref[1:2, :] = jnp.maximum(
            out_ref[1:2, :], (omax >= R - 1).astype(jnp.int32)
        )
        k = rank_at(o)
        a = sel9(k, [p[0] for p in ldsp])
        b = sel9(k, [p[1] for p in ldsp])
        er = jnp.clip(o // D - R + a, lo_r, hi_r)
        ec = jnp.clip(o % D - R + b, lo_c, hi_c)
        nxt = (er + R) * D + (ec + R)
        return (nxt, jnp.any(nxt != o), it + 1)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    o, _, _ = jax.lax.while_loop(
        cond, body, (o0, jnp.bool_(True), jnp.int32(0))
    )
    out_ref[0:1, :] = o


@functools.partial(
    jax.jit, static_argnames=("D", "R", "max_iters", "interpret")
)
def chase_fixpoint(
    rank_map: jnp.ndarray,
    bounds: jnp.ndarray,
    D: int,
    R: int,
    max_iters: int,
    interpret: bool = False,
):
    """Chase every cell's diamond walk to its fixpoint on the successor
    rank map (see bbme.diamond_walk_volume for the walk contract).

    Args:
        rank_map: (C, D*D) int8 LDSP rank map.
        bounds: (C, 8) int32; cols 0..3 = per-cell frame-clamp bounds in
            offset space (lo_r, hi_r, lo_c, hi_c), rest padding.

    Returns:
        (C,) int32 final offset indices, (C,) bool ring-visited flags.
    """
    C, DD = rank_map.shape
    # Cells chunk on lanes (see _chase_kernel): lane-tile-aligned chunks,
    # map chunk (DD, Tc) int8 under a ~4MB VMEM budget; padded cells get a
    # zero map column (rank 0 everywhere => instant center fixpoint).
    cap = max(128, ((4 << 20) // max(DD, 1)) // 128 * 128)
    Tc = min(cap, 512)
    Cp = -(-C // Tc) * Tc
    mapT = jnp.pad(rank_map, ((0, Cp - C), (0, 0))).T  # (DD, Cp)
    bndT = jnp.pad(bounds, ((0, Cp - C), (0, 0))).T  # (8, Cp)
    out = pl.pallas_call(
        functools.partial(
            _chase_kernel, D=D, R=R, max_iters=max_iters, ldsp=_CHASE_LDSP
        ),
        grid=(Cp // Tc,),
        in_specs=[
            pl.BlockSpec((DD, Tc), lambda c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Tc), lambda c: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, Tc), lambda c: (0, c), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, Cp), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_PLANES_VMEM_LIMIT
        ),
    )(mapT, bndT)
    return out[0, :C], out[1, :C].astype(bool)


def use_pallas() -> bool:
    """Pallas path only on real TPU backends (CPU tests use interpret mode
    explicitly where they want to exercise the kernel)."""
    return jax.default_backend() == "tpu"

