"""Compare XLA dot-product attention vs the Pallas TPU flash kernel at the
flagship ViT-B/8 @192x640 shapes (B=1, H=12, N=1921, D=64), and a full ViT
forward with each. Hypothesis: the N^2 softmax-logit HBM traffic (~6 GB
fp32 per forward across 12 blocks) dominates the measured 9 ms ViT time.

Run: python tools/bench_vit_attention.py
"""
import sys
import os
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.utils.benchmarking import device_time
from scenedino_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

B, H, N, D = 1, 12, 1921, 64
NP = 2048  # padded seq


def main():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, N, D), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, N, D), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, N, D), jnp.float32).astype(jnp.bfloat16)

    def xla_attn(q, k, v, salt):
        qq = q + (salt * 1e-30).astype(q.dtype)
        # (B, H, N, D) -> jax.nn API wants (B, N, H, D)
        out = jax.nn.dot_product_attention(
            qq.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
        )
        return out

    dt = device_time(xla_attn, q, k, v, iters=16)
    print(f"xla attention 12x{N}^2: {dt*1e3:7.2f} ms", flush=True)

    pad = NP - N
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    ids = (jnp.arange(NP) < N).astype(jnp.float32)[None]  # (1, NP)
    seg = SegmentIds(q=ids, kv=ids)  # pad tokens get segment 0 vs 1

    def flash(qp, kp, vp, salt):
        qq = qp + (salt * 1e-30).astype(qp.dtype)
        out = flash_attention(
            qq, kp, vp, segment_ids=seg, sm_scale=float(D) ** -0.5
        )
        return out[:, :, :N]

    dt_f = device_time(flash, qp, kp, vp, iters=16)
    print(f"pallas flash (padded {NP}): {dt_f*1e3:7.2f} ms", flush=True)

    # manual attention variants: shrink the materialized N^2 buffers
    scale = float(D) ** -0.5

    def manual(q, k, v, salt, probs_bf16=False, logits_bf16=False):
        qq = q + (salt * 1e-30).astype(q.dtype)
        pt = jnp.bfloat16 if logits_bf16 else jnp.float32
        logits = (
            jnp.einsum("bhnd,bhmd->bhnm", qq, k, preferred_element_type=pt) * scale
        )
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if probs_bf16:
            probs = probs.astype(jnp.bfloat16)
        return jnp.einsum(
            "bhnm,bhmd->bhnd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )

    for pb, lb in ((False, False), (True, False), (True, True)):
        dt_m = device_time(partial(manual, probs_bf16=pb, logits_bf16=lb), q, k, v, iters=16)
        print(f"manual probs_bf16={pb} logits_bf16={lb}: {dt_m*1e3:7.2f} ms", flush=True)

    # tuned flash block sizes
    for bq, bkm, bk in ((2048, 2048, 512), (1024, 2048, 1024), (512, 1024, 512)):
        bs = BlockSizes(
            block_q=bq, block_k_major=bkm, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bkm, block_k_dkv=bk,
            block_q_dkv=bq, block_k_major_dq=bkm, block_k_dq=bk, block_q_dq=bq,
        )

        def flash_t(qp, kp, vp, salt, _bs=bs):
            qq = qp + (salt * 1e-30).astype(qp.dtype)
            return flash_attention(
                qq, kp, vp, segment_ids=seg, sm_scale=scale, block_sizes=_bs
            )[:, :, :N]

        try:
            dt_ft = device_time(flash_t, qp, kp, vp, iters=16)
            print(f"flash bq={bq} bkm={bkm} bk={bk}: {dt_ft*1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"flash bq={bq} bkm={bkm} bk={bk}: FAIL {str(e)[:100]}", flush=True)

    # exactness vs reference (fp32 upcast both ways)
    ref = np.asarray(
        jax.nn.dot_product_attention(
            q.transpose(0, 2, 1, 3).astype(jnp.float32),
            k.transpose(0, 2, 1, 3).astype(jnp.float32),
            v.transpose(0, 2, 1, 3).astype(jnp.float32),
        )
    )
    got = np.asarray(flash(qp, kp, vp, jnp.float32(0.0))).transpose(0, 2, 1, 3)
    err = np.abs(got.astype(np.float32) - ref).max()
    print(f"max |flash - xla_fp32| = {err:.4f} (bf16 inputs)", flush=True)


if __name__ == "__main__":
    main()
