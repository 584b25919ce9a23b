"""Pallas-fused batched two-loop direction kernel.

The per-iteration core of a *batched* solve is ``vmap(apply_hv)``: two
[m, n] matvecs, the O(m^2) coefficient sweeps, and the weighted combine.
Under plain XLA these stay separate HBM passes (measured ~106 GB/s
effective on v5e at batch 4096); fusing them into one Pallas kernel reads
``s``/``y`` from HBM exactly once, keeps them in VMEM for both the
forward matvecs and the final combine, and does the tiny sweep algebra in
registers.

Dispatch: :func:`apply_hv_maybe_fused` is a ``jax.custom_batching.
custom_vmap`` wrapper — an unbatched call (single solve, sharded solve,
CPU tests) lowers to the reference XLA path in :mod:`.history`; a vmapped
call (the batch-mode solver) hits the fused kernel with the batch tiled
over the Pallas grid.  Numerics are identical to the XLA path (same
masked-Jacobi formulation, same reduction order over ``n``).

Kernel layout notes (see /opt/skills/guides/pallas_guide.md):
* blocks are [B_TILE, m, n] in VMEM — ``n`` rides the 128-lane axis, the
  tiny ``m`` axis pads to the sublane tile; the [B_TILE, m, m] sweep
  tensors are negligible traffic;
* the mask/validity precomputation (integer ring-distance logic) stays in
  XLA outside the kernel so the kernel is pure f32 arithmetic;
* batch is padded to a multiple of B_TILE with ones in ``ys``/``theta``
  (avoids spurious div-by-zero lanes), then sliced back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


Array = jax.Array

B_TILE = 256

# CONCLUSIVE NEGATIVE (round 2) — off by default, with the measurements
# and roofline math that close the question for this op on this hardware.
#
# Two layouts were built and measured on v5e (batch 4096, Rosenbrock
# n=100, m=6, scan-chained to amortize dispatch):
#
#   apply_hv alone:   XLA path 541.6 us | bmn kernel 540.3 us | m-major
#                     kernel 559.6 us       (identical within noise)
#   whole solver:     XLA path 22.3k solves/s | bmn kernel 15.2k
#
# Roofline: one apply_hv touches s,y = 2*6*100*4 B * 4096 = 19.7 MB
# (+3.3 MB for v/out); even counting the XLA path's TWO passes, the
# bandwidth bound at 819 GB/s is ~52 us — the measured 541 us sits 10x
# above it, i.e. the op is latency/occupancy-bound (100-lane rows at 78%
# lane utilization, many short ops), NOT bandwidth-bound.  A fused kernel
# can only remove HBM re-reads, which are ~10% of the real cost — hence
# the identical microbenchmark times — while the pallas_call boundary
# breaks XLA's fusion of the surrounding while-loop body, costing ~30% of
# end-to-end throughput (22.3k -> 15.2k).  The round-1 hypotheses
# (m-padding, B_TILE cap) were fixed by the m-major [2m, B, n] layout and
# made no difference, confirming the boundary/latency diagnosis.
#
# Large-n regime (n = 2^24, single instance): the op IS bandwidth-bound
# there, but [2m, n] cannot fit VMEM, so any kernel must tile over n and
# re-stream s,y for the combine pass exactly like XLA (the combine
# weights depend on ALL the dots — the two passes are algorithmically
# mandatory).  The only avoidable traffic is the v re-read, ~8% of bytes;
# XLA already runs this op at the streaming rate measured in PERF.md.
#
# Both kernels are kept compiling + parity-tested (interpreter mode) as
# infrastructure; flip ENABLED/LAYOUT to re-measure on future hardware
# where the fusion-boundary or occupancy tradeoffs may differ.
ENABLED = False

# Run the Pallas kernel in interpreter mode (CPU testing of the fused path).
INTERPRET = False


def _sweep_math(s, y, msy, msyT, yy, ys_safe, vmask, theta, v, a, m):
    """The shared apply_hv math on explicitly batched [B, ...] operands.

    Identical formulation to history.apply_hv (masked Jacobi sweeps in
    slot space); used both inside the Pallas kernel and as the batched
    XLA fallback."""
    sv = jnp.sum(s * v[:, None, :], axis=2)          # [B, m]
    yv = jnp.sum(y * v[:, None, :], axis=2)
    rhs_a = a * sv
    alpha = jnp.zeros_like(sv)
    for _ in range(m):
        acc = jnp.sum(msy * alpha[:, None, :], axis=2)
        alpha = vmask * (rhs_a - acc) / ys_safe
    base = (a * yv - jnp.sum(yy * alpha[:, None, :], axis=2)) / theta
    beta = jnp.zeros_like(sv)
    for _ in range(m):
        acc = jnp.sum(msyT * (alpha - beta)[:, None, :], axis=2)
        beta = vmask * (base + acc) / ys_safe
    w_s = alpha - beta                               # [B, m]
    w_y = -alpha / theta
    out = (a / theta) * v
    out = out + jnp.sum(w_s[:, :, None] * s, axis=1)
    out = out + jnp.sum(w_y[:, :, None] * y, axis=1)
    return out


def _kernel(s_ref, y_ref, msy_ref, msyT_ref, yy_ref, ys_ref, vm_ref,
            th_ref, v_ref, out_ref, *, a, m):
    out_ref[:] = _sweep_math(
        s_ref[:], y_ref[:], msy_ref[:], msyT_ref[:], yy_ref[:], ys_ref[:],
        vm_ref[:], th_ref[:], v_ref[:], a, m)


def _batched_fused(s, y, msy, msyT, yy, ys_safe, vmask, theta, v, a):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, m, n = s.shape
    bt = min(B_TILE, b)
    pad = (-b) % bt
    if pad:
        def padb(x, fill=0.0):
            cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, cfg, constant_values=fill)
        s, y, msy, msyT, yy, v = (padb(x) for x in (s, y, msy, msyT, yy, v))
        ys_safe = padb(ys_safe, 1.0)
        vmask = padb(vmask)
        theta = padb(theta, 1.0)
    bp = s.shape[0]

    def spec(rank):
        shape = (bt,) + ((m, n) if rank == 3 else
                         ((m, m) if rank == 32 else
                          ((m,) if rank == 2 else (1,))))
        return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, a=a, m=m),
        grid=(bp // bt,),
        in_specs=[
            spec(3), spec(3),                  # s, y
            spec(32), spec(32), spec(32),      # msy, msyT, yy
            spec(2), spec(2),                  # ys_safe, vmask
            spec(1),                           # theta [B, 1]
            pl.BlockSpec((bt, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),   # v
        ],
        out_specs=pl.BlockSpec((bt, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n), v.dtype),
        interpret=INTERPRET,
    )(s, y, msy, msyT, yy, ys_safe, vmask, theta[:, None], v)
    return out[:b] if pad else out


def _prep_masks(ys, ptr, ncorr, sy, yy, dtype):
    """Slot-space masks from the integer ring state (batched or not)."""
    m = ys.shape[-1]
    slot_ids = jnp.arange(m)
    dist = (ptr[..., None] - 1 - slot_ids) % m
    valid = dist < ncorr[..., None]
    newer = (dist[..., None, :] < dist[..., :, None]) & \
        valid[..., :, None] & valid[..., None, :]
    older = (dist[..., None, :] > dist[..., :, None]) & \
        valid[..., :, None] & valid[..., None, :]
    msy = jnp.where(newer, sy, 0.0)
    msyT = jnp.where(older, jnp.swapaxes(sy, -1, -2), 0.0)
    ys_safe = jnp.where(valid, ys, 1.0)
    vmask = valid.astype(dtype)
    return msy, msyT, ys_safe, vmask


def make_apply_hv(a: float):
    """Build the custom-vmap apply_hv for a static scale ``a``.

    Returns ``f(s, y, ys, theta, ptr, ncorr, sy, yy, v) -> a * H v``.
    """

    @jax.custom_batching.custom_vmap
    def apply_hv_cv(s, y, ys, theta, ptr, ncorr, sy, yy, v):
        # Unbatched: single-instance XLA path (batch axis of size 1).
        msy, msyT, ys_safe, vmask = _prep_masks(ys, ptr, ncorr, sy, yy,
                                                v.dtype)
        out = _sweep_math(s[None], y[None], msy[None], msyT[None], yy[None],
                          ys_safe[None], vmask[None], theta[None, None],
                          v[None], a, ys.shape[-1])
        return out[0]

    @apply_hv_cv.def_vmap
    def _rule(axis_size, in_batched, s, y, ys, theta, ptr, ncorr, sy, yy, v):
        def bc(x, batched):
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape)
        s_b, y_b, ys_b, th_b, ptr_b, nc_b, sy_b, yy_b, v_b = (
            bc(x, bat) for x, bat in zip(
                (s, y, ys, theta, ptr, ncorr, sy, yy, v), in_batched))
        msy, msyT, ys_safe, vmask = _prep_masks(ys_b, ptr_b, nc_b, sy_b,
                                                yy_b, v_b.dtype)
        impl = (_batched_fused_mmajor if LAYOUT == "mmajor"
                else _batched_fused)
        out = impl(s_b, y_b, msy, msyT, yy_b, ys_safe, vmask,
                   th_b, v_b, a)
        return out, True

    return apply_hv_cv


# ---------------------------------------------------------------------------
# Attempt 2 (round 2): m-major layout.
#
# Round 1's [B_TILE, m, n] blocks pad the m=6 axis to 8 sublanes (33% wasted
# bytes) and cap the batch tile at 256.  Here the histories are transposed
# to [2m, B, n] in XLA (s and y packed on the leading axis), so the tiled
# (sublane, lane) dims are (B_TILE, n) — no m padding, B_TILE=512, and the
# whole two-pass dataflow (dots -> sweeps -> combine) runs on one VMEM
# residency of the tile.  Selected via LAYOUT = "mmajor".
# ---------------------------------------------------------------------------

LAYOUT = "bmn"        # "bmn" (round-1 kernel) | "mmajor" (round-2 kernel)
# 512 exceeds the 16 MB scoped-VMEM limit at n=100 (19.95 MB with double
# buffering, measured on v5e); 256 fits.
B_TILE2 = 256


def _kernel_mmajor(h_ref, msy_ref, msyT_ref, yy_ref, ys_ref, vm_ref,
                   th_ref, v_ref, out_ref, *, a, m):
    """h_ref: [2m, bt, n] (s rows then y rows, m-major); everything else
    batched [bt, ...]."""
    v = v_ref[:]                                   # [bt, n]
    # Pass 1: the 2m dots ride one multiply + lane reduction per slot.
    sv_list = []
    yv_list = []
    for j in range(m):
        sv_list.append(jnp.sum(h_ref[j] * v, axis=1))        # [bt]
        yv_list.append(jnp.sum(h_ref[m + j] * v, axis=1))
    sv = jnp.stack(sv_list, axis=1)                # [bt, m]
    yv = jnp.stack(yv_list, axis=1)

    msy = msy_ref[:]
    msyT = msyT_ref[:]
    yy = yy_ref[:]
    ys_safe = ys_ref[:]
    vmask = vm_ref[:]
    theta = th_ref[:]                              # [bt, 1]

    rhs_a = a * sv
    alpha = jnp.zeros_like(sv)
    for _ in range(m):
        acc = jnp.sum(msy * alpha[:, None, :], axis=2)
        alpha = vmask * (rhs_a - acc) / ys_safe
    base = (a * yv - jnp.sum(yy * alpha[:, None, :], axis=2)) / theta
    beta = jnp.zeros_like(sv)
    for _ in range(m):
        acc = jnp.sum(msyT * (alpha - beta)[:, None, :], axis=2)
        beta = vmask * (base + acc) / ys_safe
    w_s = alpha - beta                             # [bt, m]
    w_y = -alpha / theta

    # Pass 2: combine from the SAME VMEM tile — no second HBM read.
    out = (a / theta) * v
    for j in range(m):
        out = out + w_s[:, j:j + 1] * h_ref[j]
        out = out + w_y[:, j:j + 1] * h_ref[m + j]
    out_ref[:] = out


def _batched_fused_mmajor(s, y, msy, msyT, yy, ys_safe, vmask, theta, v, a):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, m, n = s.shape
    bt = min(B_TILE2, b)
    pad = (-b) % bt
    if pad:
        def padb(x, fill=0.0):
            cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, cfg, constant_values=fill)
        s, y, msy, msyT, yy, v = (padb(x) for x in (s, y, msy, msyT, yy, v))
        ys_safe = padb(ys_safe, 1.0)
        vmask = padb(vmask)
        theta = padb(theta, 1.0)
    bp = s.shape[0]

    # m-major packing: [2m, B, n] — one XLA transpose, then the kernel's
    # tiled dims are (B_TILE, n) with no m padding.
    h = jnp.concatenate([jnp.transpose(s, (1, 0, 2)),
                         jnp.transpose(y, (1, 0, 2))], axis=0)

    def bspec(shape_tail):
        return pl.BlockSpec((bt,) + shape_tail,
                            lambda i: (i,) + (0,) * len(shape_tail),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_mmajor, a=a, m=m),
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec((2 * m, bt, n), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),      # h [2m, bt, n]
            bspec((m, m)), bspec((m, m)), bspec((m, m)),
            bspec((m,)), bspec((m,)),
            bspec((1,)),                                # theta [bt, 1]
            bspec((n,)),                                # v
        ],
        out_specs=bspec((n,)),
        out_shape=jax.ShapeDtypeStruct((bp, n), v.dtype),
        interpret=INTERPRET,
    )(h, msy, msyT, yy, ys_safe, vmask, theta[:, None], v)
    return out[:b] if pad else out


# Cache one custom-vmap function per static scale value.
@functools.lru_cache(maxsize=8)
def _cached(a: float):
    return make_apply_hv(a)


def fused_available(dtype, axis_name) -> bool:
    """The fused path serves on-chip f32/bf16 batched solves; sharded and
    f64 (CPU-test) solves keep the plain XLA path."""
    if not ENABLED or axis_name is not None:
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return jax.default_backend() == "tpu"


def apply_hv_fused(hist, v: Array, a: float) -> Array:
    """apply_hv through the custom-vmap fused kernel."""
    fn = _cached(float(a))
    return fn(hist.s, hist.y, hist.ys, hist.theta, hist.ptr, hist.ncorr,
              hist.sy, hist.yy, v)
