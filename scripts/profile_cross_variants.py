"""Micro-profile variants of the one-token cross-attention kernel.

The decode step at batch 256 is dominated by the Pallas cross kernel
(~673 us/step for 3 layers vs a ~245 us HBM floor —
profile_step_ablation).  This harness times ONE layer's worth of the
kernel (multiply by dec_layers for the per-step cost) across
formulation variants to find where the time actually goes:

  v0_current      the production kernel (ops/attention.decode_attention)
  v_block16/32    bigger batch blocks (fewer grid steps)
  v_noamax        argmax computation removed
  v_nosoftmax     exp/softmax removed (scores -> output directly):
                  bounds the VPU-transcendental share
  v_batcheddot    per-row unrolled loop replaced by one batched
                  dot_general over the block
  v_f32cast       the old formulation (upcast K/V blocks to f32)

Usage: python scripts/profile_cross_variants.py --batch 256 --iters 200
"""
from __future__ import annotations

import argparse
import functools
import math
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def make_vpu_kernel(block_b: int, n_heads: int = 8):
    """VPU formulation: one-token attention is a matvec — the MXU
    block-diagonal matmuls run at ~1% utilization (N=8 of 128 lanes in
    scores, M=8 in the PV product).  Scores: elementwise K*q + per-head
    lane-slice reductions; output: per-lane prob expansion + sublane
    reduction over T.  No MXU passes at all."""

    def kernel(len_ref, q_ref, k_ref, v_ref, o_ref, amax_ref):
        t, d = k_ref.shape[1], k_ref.shape[2]
        dh = d // n_heads
        scale = 1.0 / math.sqrt(dh)
        blk = pl.program_id(0)
        tt_ids = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)

        for r in range(block_b):
            valid = len_ref[blk * block_b + r]
            q = q_ref[r].astype(jnp.float32)          # (D,)
            k = k_ref[r]                              # (T, D) bf16
            v = v_ref[r]
            prod = k.astype(jnp.float32) * q[None, :]  # fused convert+mul
            mask_t = tt_ids < valid                   # (T, 1)
            # Per-head scores: lane-slice reductions -> 8 x (T, 1).
            sc = [jnp.sum(prod[:, h * dh:(h + 1) * dh], axis=1, keepdims=True)
                  * scale for h in range(n_heads)]
            pm_sum = None
            p_lanes = []
            for h in range(n_heads):
                s_h = jnp.where(mask_t, sc[h], NEG_INF)
                m = jnp.max(s_h, axis=0, keepdims=True)
                e = jnp.exp(s_h - m)
                z = jnp.sum(e, axis=0, keepdims=True)
                p_h = e / z                           # (T, 1)
                pm_sum = p_h if pm_sum is None else pm_sum + p_h
                p_lanes.append(jnp.broadcast_to(p_h, (t, dh)))
            p_lane = jnp.concatenate(p_lanes, axis=1)  # (T, D)
            out = jnp.sum(v.astype(jnp.float32) * p_lane, axis=0)  # (D,)
            o_ref[r, :] = out.astype(o_ref.dtype)
            pm_max = jnp.max(pm_sum, axis=0, keepdims=True)
            amax_ref[r, 0] = jnp.min(jnp.where(pm_sum >= pm_max, tt_ids, 2 ** 30))

    return kernel


def make_kernel(block_b: int, *, amax: bool = True, softmax: bool = True,
                batched: bool = False, f32cast: bool = False, pv_bf16: bool = True,
                n_heads: int = 8):
    def kernel(len_ref, q_ref, k_ref, v_ref, o_ref, amax_ref):
        t, d = k_ref.shape[1], k_ref.shape[2]
        dh = d // n_heads
        scale = 1.0 / math.sqrt(dh)
        blk = pl.program_id(0)
        i_ids = jax.lax.broadcasted_iota(jnp.int32, (d, n_heads), 0)
        h_ids = jax.lax.broadcasted_iota(jnp.int32, (d, n_heads), 1)
        memb = (h_ids.T == i_ids.T // dh).astype(jnp.float32)  # (H, D)
        t_ids = jax.lax.broadcasted_iota(jnp.int32, (t, n_heads), 0)
        tt_ids = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)

        if batched:
            q = q_ref[...].astype(jnp.float32)        # (BB, D)
            qmat = jnp.einsum("bd,dh->bdh", q,
                              (i_ids // dh == h_ids).astype(jnp.float32))
            k = k_ref[...]
            sc = jax.lax.dot_general(
                k, qmat.astype(k.dtype),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale  # (BB, T, H)
            valid = jnp.zeros((block_b, 1, 1), jnp.int32)
            for r in range(block_b):
                valid = jax.lax.dynamic_update_slice(
                    valid, len_ref[blk * block_b + r].reshape(1, 1, 1), (r, 0, 0))
            sc = jnp.where(t_ids[None] < valid, sc, NEG_INF)
            m = jnp.max(sc, axis=1, keepdims=True)
            p = jnp.exp(sc - m)
            z = jnp.sum(p, axis=1, keepdims=True)
            p = p / z
            v = v_ref[...]
            oh = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # (BB, H, D)
            out = jnp.einsum("bhd,hd->bd", oh, memb)
            o_ref[...] = out.astype(o_ref.dtype)
            for r in range(block_b):
                amax_ref[r, 0] = 0
            return

        for r in range(block_b):
            valid = len_ref[blk * block_b + r]
            q = q_ref[r].astype(jnp.float32)
            k = k_ref[r]
            v = v_ref[r]
            if f32cast:
                k = k.astype(jnp.float32)
                v = v.astype(jnp.float32)
            qmat = jnp.where(i_ids // dh == h_ids, q.reshape(d, 1), 0.0)
            qmat = qmat.astype(k.dtype)
            sc = jnp.dot(k, qmat, preferred_element_type=jnp.float32) * scale
            sc = jnp.where(t_ids < valid, sc, NEG_INF)
            if softmax:
                m = jnp.max(sc, axis=0, keepdims=True)
                p = jnp.exp(sc - m)
                z = jnp.sum(p, axis=0, keepdims=True)
                p = p / z
            else:
                p = jnp.maximum(sc, 0.0) * 1e-3
            if amax:
                pmean = jnp.sum(p, axis=1, keepdims=True)
                pm_max = jnp.max(pmean, axis=0, keepdims=True)
                amax_ref[r, 0] = jnp.min(jnp.where(pmean >= pm_max, tt_ids, 2 ** 30))
            else:
                amax_ref[r, 0] = 0
            pv = p.astype(v.dtype) if pv_bf16 else p.astype(jnp.float32)
            oh = jnp.dot(pv, jnp.zeros((0,)), preferred_element_type=jnp.float32) \
                if False else jnp.dot(pv.T, v, preferred_element_type=jnp.float32)
            out = jnp.sum(memb * oh, axis=0)
            o_ref[r, :] = out.astype(o_ref.dtype)

    return kernel


def build(fn_kernel, b, t, d, block_b, dtype):
    grid = (b // block_b,)

    @jax.jit
    def call(valid, q, k, v):
        out, amax = pl.pallas_call(
            fn_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((block_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((block_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, d), dtype),
                jax.ShapeDtypeStruct((b, 1), jnp.int32),
            ),
        )(valid, q, k, v)
        return out, amax

    return call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--t", type=int, default=256)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    b, t, d = args.batch, args.t, args.d
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((b, t, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, t, d)), dtype)
    q0 = jnp.asarray(rng.standard_normal((b, d)), dtype)
    valid = jnp.full((b,), t, jnp.int32)

    variants = {
        "v0_current": (8, {}),
        "v_block4": (4, {}),
        "v_block16": (16, {}),
        # block32 exceeds VMEM (double-buffered 2x8MB K/V blocks);
        # batched dot_general fails Mosaic attribute parsing.
        "v_noamax": (8, dict(amax=False)),
        "v_nosoftmax": (8, dict(amax=False, softmax=False)),
        "v_f32cast": (8, dict(f32cast=True)),
        "v_pvf32": (8, dict(pv_bf16=False)),
    }
    variants["v_vpu"] = (8, dict(vpu=True))
    variants["v_vpu16"] = (16, dict(vpu=True))
    if args.only:
        variants = {n: v for n, v in variants.items() if n in args.only.split(",")}

    for name, (block_b, kw) in variants.items():
        try:
            if kw.get("vpu"):
                kern = make_vpu_kernel(block_b, n_heads=args.heads)
            else:
                kern = make_kernel(block_b, n_heads=args.heads, **kw)
            call = build(kern, b, t, d, block_b, dtype)

            @jax.jit
            def loop(q, k, v, valid):
                def body(i, qq):
                    out, _ = call(valid, qq, k, v)
                    return out.astype(qq.dtype)
                # Scalar readback forces real completion — the relay's
                # block_until_ready is unreliable (docs/PERF.md).
                return jnp.sum(jax.lax.fori_loop(0, args.iters, body, q)
                               .astype(jnp.float32))

            _ = float(loop(q0, k, v, valid))
            t0 = time.perf_counter()
            _ = float(loop(q0, k, v, valid))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(2):
                r2 = loop(q0, k, v, valid)
            _ = float(r2)
            t2 = time.perf_counter() - t0
            per = (t2 - t1) / args.iters
            gbs = (2 * b * t * d * 2) / per / 1e9
            print(f"{name:14s}: {per*1e6:8.2f} us/call  ({gbs:6.1f} GB/s K+V)  "
                  f"[1x {t1*1e3:.0f}ms 2x {t2*1e3:.0f}ms]")
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{name:14s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
