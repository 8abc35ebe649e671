"""Fused bias+leaky-relu+instance-norm(+AdaIN) Pallas TPU kernel.

Semantics (matches models/style.py's EncodeBlock/DecodeBlock norm sites,
i.e. /root/reference/style_soft_intro_vae/net.py:97-181):

    e   = leaky_relu(x + inject + bias, slope)        # producer chain
    m,v = spatial moments of e (per batch, channel)   # instance-norm stats
    y   = (e - m) * rsqrt(v + eps) * g + b            # IN (+ AdaIN when g,b)

where ``inject`` is one of
  * nothing                        (mode="plain"  — encoder blocks)
  * noise_weight * n               (mode="noise"  — decoder, training)
  * s*exp(-x^2/2s^2)*0.8/sqrt(2pi) (mode="corr"   — decoder, noise="none")

STATUS: measured NEGATIVE result — kept as an opt-in, default OFF.
The hypothesis was that XLA materializes this chain as [producer: 1r+1w] +
[moments reduce: 1r] + [affine: 1r+1w]; the two-phase kernel below (phase 0
recomputes ``e`` tile-by-tile and accumulates moments in VMEM scratch,
phase 1 recomputes and applies the affine) would then cut traffic to
2 reads + 1 write. The on-chip A/B (BENCH_NOTES.md "Fused IN+AdaIN Pallas
kernel") shows XLA ALREADY fuses the producer into both consumers — the
same 2r+1w structure — with better layout freedom (flat re-vectorization
vs channel-tiled lanes, which pad 2x at the C=64 hi-res blocks), so the
kernel loses 1.2-6x at every real model shape and regresses the ffhq256
max-LOD step 66.8 -> 36.9 img/s. Enable via SIV_FUSED_NORM=1 or
StyleModelConfig(fused_norm=True) to re-evaluate on future hardware.

Moments accumulate in f32 (one-pass E[e^2]-m^2, same semantics as
models/style.py:_moments). The public entry falls back to a pure-jnp
composition off-TPU; the kernel itself is testable anywhere via
interpret=True (tests/test_adain_pallas.py).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_CORR_K = 0.8 / math.sqrt(2.0 * math.pi)
# per-tile VMEM budget for the (St, C) activation block; backward holds
# three such blocks (dy, x, dx) double-buffered, so keep this modest
_TILE_BYTES = 1 * 1024 * 1024


@dataclasses.dataclass(frozen=True)
class _Cfg:
    mode: str            # "plain" | "noise" | "corr"
    affine: bool         # True: AdaIN gain/bias applied (decoder sites)
    eps: float
    slope: float
    corr_scale: float
    interpret: bool


def _pick_tile(S: int, C: int, itemsize: int) -> int:
    """Largest power-of-two St dividing S with the padded tile under budget."""
    lanes = max(C, 128)  # lane padding below 128 channels still costs VMEM
    st = S
    while st > 16 and st * lanes * itemsize > _TILE_BYTES:
        st //= 2
    return st


def _producer(cfg: _Cfg, x_f32, bias_row, nw_row, n_col):
    """e and pre-activation from the conv output tile (all f32)."""
    if cfg.mode == "noise":
        x_f32 = x_f32 + nw_row * n_col
    elif cfg.mode == "corr":
        s = cfg.corr_scale
        x_f32 = x_f32 + (_CORR_K * s) * jnp.exp(x_f32 * x_f32 * (-0.5 / (s * s)))
    pre = x_f32 + bias_row
    e = jnp.where(pre >= 0, pre, cfg.slope * pre)
    return e, pre


# ---------------------------------------------------------------- forward

def _fwd_pallas(cfg: _Cfg, x, bias, g, b, n, nw):
    B, S, C = x.shape
    St = _pick_tile(S, C, x.dtype.itemsize)
    nS = S // St
    grid = (B, 2, nS)
    f32 = jnp.float32

    def kernel(*refs):
        if cfg.mode == "noise":
            if cfg.affine:
                x_ref, bias_ref, nw_ref, n_ref, g_ref, b_ref = refs[:6]
                rest = refs[6:]
            else:
                x_ref, bias_ref, nw_ref, n_ref = refs[:4]
                g_ref = b_ref = None
                rest = refs[4:]
        else:
            if cfg.affine:
                x_ref, bias_ref, g_ref, b_ref = refs[:4]
                rest = refs[4:]
            else:
                x_ref, bias_ref = refs[:2]
                g_ref = b_ref = None
                rest = refs[2:]
            nw_ref = n_ref = None
        y_ref, m_ref, v_ref, sum_ref, sq_ref, a_ref, c_ref = rest

        ph = pl.program_id(1)
        s = pl.program_id(2)

        def compute_e():
            x_f32 = x_ref[0].astype(f32)                      # (St, C)
            bias_row = bias_ref[0].astype(f32)                # (1, C)
            if cfg.mode == "noise":
                nw_row = nw_ref[0].astype(f32)                # (1, C)
                n_col = n_ref[0].astype(f32)                  # (St, 1)
            else:
                nw_row = n_col = None
            e, _ = _producer(cfg, x_f32, bias_row, nw_row, n_col)
            return e

        @pl.when(ph == 0)
        def _():
            e = compute_e()
            @pl.when(s == 0)
            def _():
                sum_ref[:] = jnp.zeros_like(sum_ref)
                sq_ref[:] = jnp.zeros_like(sq_ref)
            sum_ref[:] += jnp.sum(e, axis=0, keepdims=True)
            sq_ref[:] += jnp.sum(e * e, axis=0, keepdims=True)

            @pl.when(s == nS - 1)
            def _():
                m = sum_ref[:] / S
                v = jnp.maximum(sq_ref[:] / S - m * m, 0.0)
                m_ref[0] = m
                v_ref[0] = v
                rstd = jax.lax.rsqrt(v + cfg.eps)
                a = rstd * g_ref[0] if cfg.affine else rstd
                a_ref[:] = a
                c_ref[:] = (b_ref[0] - m * a) if cfg.affine else (-m * a)

        @pl.when(ph == 1)
        def _():
            e = compute_e()
            y_ref[0] = (e * a_ref[:] + c_ref[:]).astype(y_ref.dtype)

    x_spec = pl.BlockSpec((1, St, C), lambda bb, ph, s: (bb, s, 0),
                          memory_space=pltpu.VMEM)
    row_const = pl.BlockSpec((1, 1, C), lambda bb, ph, s: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    row_b = pl.BlockSpec((1, 1, C), lambda bb, ph, s: (bb, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [x_spec, row_const]
    args = [x, bias.reshape(1, 1, C)]
    if cfg.mode == "noise":
        in_specs += [row_const,
                     pl.BlockSpec((1, St, 1), lambda bb, ph, s: (bb, s, 0),
                                  memory_space=pltpu.VMEM)]
        args += [nw.reshape(1, 1, C), n]
    if cfg.affine:
        in_specs += [row_b, row_b]
        args += [g.reshape(B, 1, C), b.reshape(B, 1, C)]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            # phase 0 parks the (unwritten) y buffer on block (bb, 0) so no
            # garbage flush happens before phase 1 overwrites it
            pl.BlockSpec((1, St, C), lambda bb, ph, s: (bb, ph * s, 0),
                         memory_space=pltpu.VMEM),
            row_b, row_b,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, C), x.dtype),
            jax.ShapeDtypeStruct((B, 1, C), f32),
            jax.ShapeDtypeStruct((B, 1, C), f32),
        ],
        scratch_shapes=[pltpu.VMEM((1, C), f32)] * 4,
        interpret=cfg.interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * B * S * C,
            bytes_accessed=(2 * B * S * C + B * S * C) * x.dtype.itemsize,
            transcendentals=B * S * C if cfg.mode == "corr" else 0,
        ),
    )(*args)
    y, m, v = out
    return y, m.reshape(B, C), v.reshape(B, C)


# ---------------------------------------------------------------- backward

def _bwd_pallas(cfg: _Cfg, x, bias, g, n, nw, m, v, dy, dm, dv):
    B, S, C = x.shape
    St = _pick_tile(S, C, max(x.dtype.itemsize, dy.dtype.itemsize))
    # backward streams dy + x in and dx out per tile: halve the tile to keep
    # three double-buffered blocks under VMEM
    St = max(St // 2, min(S, 16))
    while S % St:
        St //= 2
    nS = S // St
    grid = (B, 2, nS)
    f32 = jnp.float32

    def kernel(*refs):
        i = 0
        dy_ref = refs[i]; i += 1
        x_ref = refs[i]; i += 1
        bias_ref = refs[i]; i += 1
        if cfg.mode == "noise":
            nw_ref = refs[i]; i += 1
            n_ref = refs[i]; i += 1
        else:
            nw_ref = n_ref = None
        g_ref = None
        if cfg.affine:
            g_ref = refs[i]; i += 1
        m_ref = refs[i]; i += 1
        v_ref = refs[i]; i += 1
        dm_ref = refs[i]; i += 1
        dv_ref = refs[i]; i += 1
        (dx_ref, dbst_ref, dg_ref, dbias_ref, dnw_ref,
         sdy_ref, sde_ref, u1_ref, u2_ref, abias_ref, anw_ref) = refs[i:]

        ph = pl.program_id(1)
        s = pl.program_id(2)

        def compute():
            x_f32 = x_ref[0].astype(f32)
            bias_row = bias_ref[0].astype(f32)
            if cfg.mode == "noise":
                nw_row = nw_ref[0].astype(f32)
                n_col = n_ref[0].astype(f32)
            else:
                nw_row = n_col = None
            e, pre = _producer(cfg, x_f32, bias_row, nw_row, n_col)
            rstd = jax.lax.rsqrt(v_ref[0] + cfg.eps)
            ehat = (e - m_ref[0]) * rstd
            return e, pre, ehat, rstd, x_f32, n_col

        @pl.when(ph == 0)
        def _():
            dy_t = dy_ref[0].astype(f32)
            _, _, ehat, _, _, _ = compute()
            @pl.when(s == 0)
            def _():
                sdy_ref[:] = jnp.zeros_like(sdy_ref)
                sde_ref[:] = jnp.zeros_like(sde_ref)
            sdy_ref[:] += jnp.sum(dy_t, axis=0, keepdims=True)
            sde_ref[:] += jnp.sum(dy_t * ehat, axis=0, keepdims=True)

            @pl.when(s == nS - 1)
            def _():
                dbst_ref[0] = sdy_ref[:]
                dg_ref[0] = sde_ref[:]
                u1_ref[:] = sdy_ref[:] / S
                u2_ref[:] = sde_ref[:] / S

        @pl.when(ph == 1)
        def _():
            dy_t = dy_ref[0].astype(f32)
            e, pre, ehat, rstd, x_f32, n_col = compute()
            gain = rstd * g_ref[0] if cfg.affine else rstd
            de = gain * (dy_t - u1_ref[:] - ehat * u2_ref[:])
            # m, v are first-class outputs (the encoder style head consumes
            # them); fold their cotangents into de
            de += dm_ref[0] * (1.0 / S) + dv_ref[0] * ((2.0 / S) * (e - m_ref[0]))
            dp = de * jnp.where(pre >= 0, 1.0, cfg.slope)

            @pl.when(s == 0)
            def _():
                abias_ref[:] = jnp.zeros_like(abias_ref)
                anw_ref[:] = jnp.zeros_like(anw_ref)
            abias_ref[:] += jnp.sum(dp, axis=0, keepdims=True)
            if cfg.mode == "noise":
                anw_ref[:] += jnp.sum(dp * n_col, axis=0, keepdims=True)
                dx = dp
            elif cfg.mode == "corr":
                sc = cfg.corr_scale
                corr = (_CORR_K * sc) * jnp.exp(x_f32 * x_f32 * (-0.5 / (sc * sc)))
                dx = dp * (1.0 - (x_f32 / (sc * sc)) * corr)
            else:
                dx = dp
            dx_ref[0] = dx.astype(dx_ref.dtype)

            @pl.when(s == nS - 1)
            def _():
                dbias_ref[0] = abias_ref[:]
                dnw_ref[0] = anw_ref[:]

    x_spec = pl.BlockSpec((1, St, C), lambda bb, ph, s: (bb, s, 0),
                          memory_space=pltpu.VMEM)
    row_const = pl.BlockSpec((1, 1, C), lambda bb, ph, s: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    row_b = pl.BlockSpec((1, 1, C), lambda bb, ph, s: (bb, 0, 0),
                         memory_space=pltpu.VMEM)

    in_specs = [x_spec, x_spec, row_const]
    args = [dy, x, bias.reshape(1, 1, C)]
    if cfg.mode == "noise":
        in_specs += [row_const,
                     pl.BlockSpec((1, St, 1), lambda bb, ph, s: (bb, s, 0),
                                  memory_space=pltpu.VMEM)]
        args += [nw.reshape(1, 1, C), n]
    if cfg.affine:
        in_specs += [row_b]
        args += [g.reshape(B, 1, C)]
    in_specs += [row_b, row_b, row_b, row_b]
    args += [m.reshape(B, 1, C), v.reshape(B, 1, C),
             dm.reshape(B, 1, C), dv.reshape(B, 1, C)]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, St, C), lambda bb, ph, s: (bb, ph * s, 0),
                         memory_space=pltpu.VMEM),
            row_b, row_b, row_b, row_b,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, C), x.dtype),   # dx
            jax.ShapeDtypeStruct((B, 1, C), f32),       # d(style bias)
            jax.ShapeDtypeStruct((B, 1, C), f32),       # d(style gain)
            jax.ShapeDtypeStruct((B, 1, C), f32),       # d(bias) per-b part
            jax.ShapeDtypeStruct((B, 1, C), f32),       # d(noise weight) per-b part
        ],
        scratch_shapes=[pltpu.VMEM((1, C), f32)] * 6,
        interpret=cfg.interpret,
        cost_estimate=pl.CostEstimate(
            flops=20 * B * S * C,
            bytes_accessed=(4 * B * S * C + B * S * C) * x.dtype.itemsize,
            transcendentals=2 * B * S * C if cfg.mode == "corr" else 0,
        ),
    )(*args)
    dx, dbst, dg, dbias_p, dnw_p = out
    return (dx, dbst.reshape(B, C), dg.reshape(B, C),
            dbias_p.reshape(B, C), dnw_p.reshape(B, C))


# ------------------------------------------------------------- custom VJP

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(cfg: _Cfg, x, bias, g, b, n, nw):
    y, m, v = _fwd_pallas(cfg, x, bias, g, b, n, nw)
    return y, m, v


def _fused_fwd(cfg, x, bias, g, b, n, nw):
    y, m, v = _fwd_pallas(cfg, x, bias, g, b, n, nw)
    return (y, m, v), (x, bias, g, n, nw, m, v)


def _fused_bwd(cfg, res, cts):
    x, bias, g, n, nw, m, v = res
    dy, dm, dv = cts
    dx, dbst, dg, dbias_p, dnw_p = _bwd_pallas(
        cfg, x, bias, g, n, nw, m, v,
        dy.astype(x.dtype), dm.astype(jnp.float32), dv.astype(jnp.float32))
    dbias = jnp.sum(dbias_p, axis=0).astype(bias.dtype)
    if cfg.mode == "noise":
        dnw = jnp.sum(dnw_p, axis=0).astype(nw.dtype)
    else:
        dnw = jnp.zeros_like(nw)
    if not cfg.affine:
        dg = jnp.zeros_like(g)
        dbst = jnp.zeros_like(g)
    return (dx, dbias, dg.astype(g.dtype), dbst.astype(g.dtype),
            jnp.zeros_like(n), dnw)


_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------- public

def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def fused_bias_act_norm(
    x: Array,
    bias: Array,
    *,
    g: Optional[Array] = None,
    b: Optional[Array] = None,
    n: Optional[Array] = None,
    nw: Optional[Array] = None,
    mode: str = "plain",
    eps: float = 1e-8,
    slope: float = 0.2,
    corr_scale: float = 1.0,
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array, Array]:
    """Fused producer+IN(+AdaIN) over NHWC ``x``; returns (y, mean, var).

    x: (B, H, W, C) conv output (pre-bias). bias: (C,). For AdaIN pass
    g=(s0+1) and b=s1 as (B, C) f32 (net.py:169-181); omit both for the
    encoder's plain instance norm. mode="noise" takes n (B, H, W) and
    nw (C,); mode="corr" applies the deterministic correction with
    corr_scale=sqrt(layer+1) (net.py:176-178).
    """
    if mode not in ("plain", "noise", "corr"):
        raise ValueError(f"unknown mode {mode!r}")
    if interpret is None and not _on_tpu():
        # documented off-TPU fallback: the pure-jnp composition, NOT the
        # interpret-mode kernel (which emulates every grid step and is
        # orders of magnitude slower). Pass interpret=True explicitly to
        # exercise the kernel itself off-TPU (the parity tests do).
        return reference_bias_act_norm(x, bias, g=g, b=b, n=n, nw=nw, mode=mode,
                                       eps=eps, slope=slope, corr_scale=corr_scale)
    B, H, W, C = x.shape
    affine = g is not None
    cfg = _Cfg(mode=mode, affine=affine, eps=float(eps), slope=float(slope),
               corr_scale=float(corr_scale),
               interpret=bool(interpret))
    f32 = jnp.float32
    if g is None:
        g = jnp.zeros((B, C), f32)
        b = jnp.zeros((B, C), f32)
    if mode == "noise":
        if n is None or nw is None:
            raise ValueError("mode='noise' needs n (B,H,W) and nw (C,)")
        n = n.reshape(B, H * W, 1).astype(f32)
    else:
        n = jnp.zeros((1, 1, 1), f32)
        nw = jnp.zeros((1,), f32)
    y, m, v = _fused(cfg, x.reshape(B, H * W, C), bias.astype(f32),
                     g.astype(f32), b.astype(f32), n, nw.astype(f32))
    return y.reshape(B, H, W, C), m, v


def reference_bias_act_norm(
    x: Array,
    bias: Array,
    *,
    g: Optional[Array] = None,
    b: Optional[Array] = None,
    n: Optional[Array] = None,
    nw: Optional[Array] = None,
    mode: str = "plain",
    eps: float = 1e-8,
    slope: float = 0.2,
    corr_scale: float = 1.0,
) -> Tuple[Array, Array, Array]:
    """Pure-jnp oracle with identical semantics (f32 producer + one-pass
    moments), for parity tests and the non-TPU fallback path."""
    f32 = jnp.float32
    xe = x.astype(f32)
    if mode == "noise":
        xe = xe + nw.astype(f32) * n[..., None].astype(f32)
    elif mode == "corr":
        s = corr_scale
        xe = xe + (_CORR_K * s) * jnp.exp(xe * xe * (-0.5 / (s * s)))
    pre = xe + bias.astype(f32)
    e = jnp.where(pre >= 0, pre, slope * pre)
    m = jnp.mean(e, axis=(1, 2))
    v = jnp.maximum(jnp.mean(e * e, axis=(1, 2)) - m * m, 0.0)
    rstd = jax.lax.rsqrt(v + eps)
    a = rstd * g.astype(f32) if g is not None else rstd
    c = (b.astype(f32) - m * a) if g is not None else (-m * a)
    y = e * a[:, None, None, :] + c[:, None, None, :]
    return y.astype(x.dtype), m, v
