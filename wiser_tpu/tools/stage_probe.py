"""Per-stage device-time decomposition of the pruned-dense kernel — the
route behind the slowest 1M mix classes (zipf_t3/t4, dense_t3,
dense_all_head_pair in ROUTE_1M_R5).

The kernel body is three stages (kernels._pruned_dense_body):
  S1 block-select: ub compute over (B, NB) + lax.top_k(ub, C+1)
  S2 payload: (B, T, C, 128) row gathers + tc score recomposition
  S3 final:   lax.top_k(score over C*128, M) + tf backout + flags
This probe times cumulative jitted prefixes (S1; S1+S2; full) and two
top_k isolates, then a TWO-LEVEL block-select variant (superblock
maxima -> top_k over NB/SB at k=C/SB, expand — the "two-level
block-summary search" lever from the roadmap), reporting per-query
microseconds and the guard-flag-rate delta the coarser next_ub costs.

Timing protocol per CLAUDE.md: np.asarray readback of a packed small
output (block_until_ready unreliable over the tunnel); per-call wall
includes one ~30 ms RTT — at B=512 the stage costs are 100s of ms, so
RTT noise is <10%.

Run (TPU): python -m wiser_tpu.tools.stage_probe --index .scale_cache/idx_c1m
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_call(fn, *args, reps=4):
    outs = fn(*args)
    np.asarray(outs[0] if isinstance(outs, tuple) else outs)  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = fn(*args)
        np.asarray(outs[0] if isinstance(outs, tuple) else outs)
    return (time.perf_counter() - t0) / reps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", default=".scale_cache/idx_c1m")
    ap.add_argument("--B", type=int, default=512)
    ap.add_argument("--T", type=int, default=3)
    ap.add_argument("--C", type=int, default=512)
    ap.add_argument("--M", type=int, default=16)
    ap.add_argument("--SB", type=int, default=8,
                    help="two-level superblock size (blocks)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from wiser_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from wiser_tpu.engine import kernels as K
    from wiser_tpu.engine.device import TpuEngine
    from wiser_tpu.index.format import PackedIndex
    from wiser_tpu.utils import serial_jit

    packed = PackedIndex.load(args.index)
    eng = TpuEngine(packed, columns="tc")
    B, T, C, M, SB = args.B, args.T, args.C, args.M, args.SB
    NB = eng._n_pad_docs // 128
    eps3 = 3.0 * eng.rel_eps
    log(f"NB={NB} B={B} T={T} C={C} M={M}")

    # realistic all-head conjunctions: zipf draw over df rank, dense rows
    rng = np.random.default_rng(5)
    order = np.argsort(packed.df)[::-1]
    dense_rows = order[np.asarray(
        [eng._dense_slot[r] >= 0 for r in order])][:2048]
    ranks = np.minimum(rng.zipf(1.25, size=(B, T)) - 1, len(dense_rows) - 1)
    rows = dense_rows[ranks]
    slots = np.zeros((B, T), dtype=np.int32)
    idf32 = np.zeros((B, T), dtype=np.float32)
    for b in range(B):
        for t in range(T):
            slots[b, t] = eng._dense_slot[rows[b, t]]
            idf32[b, t] = np.float32(packed.idf64[rows[b, t]])
    ks = np.full(B, 10, dtype=np.int32)
    d_slots, d_idf, d_ks = jnp.asarray(slots), jnp.asarray(idf32), \
        jnp.asarray(ks)

    res = {"NB": int(NB), "B": B, "T": T, "C": C, "M": M, "SB": SB}

    weights_of = lambda idf: (idf > 0).astype(jnp.float32)

    @serial_jit
    def s1_select(slots, idf):
        blk, next_ub = K._select_ub_blocks(
            eng.d_dense_blockmax, slots, weights_of(idf), T=T, NB=NB, C=C,
            blockmax2=eng.d_dense_blockmax2, argpos=eng.d_dense_argpos)
        return blk.sum() + next_ub.sum().astype(jnp.int32)

    @serial_jit
    def s1_ub_only(slots, idf):
        # ub compute WITHOUT the top_k: isolates gather+arith from select
        weights = weights_of(idf)
        feas = jnp.ones((B, NB), dtype=bool)
        bms, bm2s, aps = [], [], []
        for t in range(T):
            bm = jnp.take(eng.d_dense_blockmax, slots[:, t], axis=0)
            w = weights[:, t : t + 1]
            bms.append(bm * w)
            feas = feas & ((bm > 0.0) | (w == 0.0))
            bm2s.append(jnp.take(eng.d_dense_blockmax2, slots[:, t],
                                 axis=0) * w)
            aps.append(jnp.take(eng.d_dense_argpos, slots[:, t],
                                axis=0).astype(jnp.int32))
        ub = jnp.full((B, NB), -jnp.inf, dtype=jnp.float32)
        for ts in range(T):
            bound = bms[ts]
            for t in range(T):
                if t != ts:
                    bound = bound + jnp.where(aps[t] == aps[ts],
                                              bms[t], bm2s[t])
            ub = jnp.maximum(ub, bound)
        ub = jnp.where(feas, ub, 0.0)
        return ub.sum()

    def payload_score(slots, idf, blk):
        tf_rows = eng.d_dense_tf8.reshape(-1, 128)
        len_rows = eng.d_len_code.reshape(NB, 128)
        score = jnp.zeros((B, C, 128), dtype=jnp.float32)
        match = jnp.ones((B, C, 128), dtype=bool)
        for t in range(T):
            rows_idx = slots[:, t : t + 1] * np.int32(NB) + blk
            tf = jnp.take(tf_rows, rows_idx, axis=0).astype(jnp.int32)
            code = jnp.take(len_rows, blk, axis=0).astype(jnp.int32) << 8
            p = jnp.where(tf > 0, code | tf, 0).astype(jnp.float32)
            match = match & (p > 0)
            score = score + K.tc_score(p.astype(jnp.int32),
                                       idf[:, t, None, None], eng.d_avg32)
        return jnp.where(match, score, K.NEG_INF).reshape(B, -1)

    @serial_jit
    def s2_payload(slots, idf):
        blk, next_ub = K._select_ub_blocks(
            eng.d_dense_blockmax, slots, weights_of(idf), T=T, NB=NB, C=C,
            blockmax2=eng.d_dense_blockmax2, argpos=eng.d_dense_argpos)
        return payload_score(slots, idf, blk).sum()

    def full_kernel(slots, idf, ks):
        kern = K.make_pruned_dense_kernel_tc(T, NB, C, M, eps3)
        return kern(eng.d_dense_tf8, eng.d_len_code, eng.d_avg32,
                    eng.d_dense_blockmax, eng.d_dense_blockmax2,
                    eng.d_dense_argpos, slots, idf, ks)

    @serial_jit
    def topk_blocks(x):
        s, i = jax.lax.top_k(x, C + 1)
        return s.sum() + i.sum().astype(jnp.float32)

    @serial_jit
    def topk_lanes(x):
        s, i = jax.lax.top_k(x, M)
        return s.sum() + i.sum().astype(jnp.float32)

    # --- two-level select: superblock max -> small top_k -> expand ---
    NSB = -(-NB // SB)  # pad the tail superblock with ub 0
    CS = max(C // SB, 1)

    def select_two_level(slots, idf):
        weights = weights_of(idf)
        feas = jnp.ones((B, NB), dtype=bool)
        bms, bm2s, aps = [], [], []
        for t in range(T):
            bm = jnp.take(eng.d_dense_blockmax, slots[:, t], axis=0)
            w = weights[:, t : t + 1]
            bms.append(bm * w)
            feas = feas & ((bm > 0.0) | (w == 0.0))
            bm2s.append(jnp.take(eng.d_dense_blockmax2, slots[:, t],
                                 axis=0) * w)
            aps.append(jnp.take(eng.d_dense_argpos, slots[:, t],
                                axis=0).astype(jnp.int32))
        ub = jnp.full((B, NB), -jnp.inf, dtype=jnp.float32)
        for ts in range(T):
            bound = bms[ts]
            for t in range(T):
                if t != ts:
                    bound = bound + jnp.where(aps[t] == aps[ts],
                                              bms[t], bm2s[t])
            ub = jnp.maximum(ub, bound)
        ub = jnp.where(feas, ub, 0.0)
        if NSB * SB != NB:
            ub = jnp.pad(ub, ((0, 0), (0, NSB * SB - NB)))
        sb_ub = ub.reshape(B, NSB, SB).max(axis=2)
        top_ub, top_i = jax.lax.top_k(sb_ub, CS + 1)
        next_ub = top_ub[:, CS]
        neg_sorted, _ = jax.lax.top_k(-top_i[:, :CS].astype(jnp.float32),
                                      CS)
        sb = (-neg_sorted).astype(jnp.int32)
        blk = (sb[:, :, None] * SB
               + jnp.arange(SB, dtype=jnp.int32)[None, None, :]
               ).reshape(B, CS * SB)
        return jnp.minimum(blk, np.int32(NB - 1)), next_ub

    @serial_jit
    def s1_two_level(slots, idf):
        blk, next_ub = select_two_level(slots, idf)
        return blk.sum() + next_ub.sum().astype(jnp.int32)

    @serial_jit
    def full_two_level(slots, idf, ks):
        blk, next_ub = select_two_level(slots, idf)
        score = payload_score(slots, idf, blk)
        top_score, top_l = jax.lax.top_k(score, M)
        flag = K.prune_guard_flag(top_score, next_ub, ks, M=M, eps3=eps3)
        return top_score.sum(), flag

    # ---- measurements ----
    rnd_blocks = jnp.asarray(
        rng.random((B, NB), dtype=np.float32))
    rnd_lanes = jnp.asarray(
        rng.random((B, C * 128), dtype=np.float32))

    res["s1_ub_only_ms"] = round(1e3 * time_call(s1_ub_only, d_slots,
                                                 d_idf), 1)
    res["s1_select_ms"] = round(1e3 * time_call(s1_select, d_slots,
                                                d_idf), 1)
    res["s1_two_level_ms"] = round(1e3 * time_call(s1_two_level, d_slots,
                                                   d_idf), 1)
    res["s2_payload_ms"] = round(1e3 * time_call(s2_payload, d_slots,
                                                 d_idf), 1)
    res["full_ms"] = round(1e3 * time_call(full_kernel, d_slots, d_idf,
                                           d_ks), 1)
    res["full_two_level_ms"] = round(
        1e3 * time_call(full_two_level, d_slots, d_idf, d_ks), 1)
    res["topk_blocks_ms"] = round(1e3 * time_call(topk_blocks,
                                                  rnd_blocks), 1)
    res["topk_lanes_ms"] = round(1e3 * time_call(topk_lanes,
                                                 rnd_lanes), 1)

    # guard-flag-rate delta of the coarser two-level next_ub
    kern = K.make_pruned_dense_kernel_tc(T, NB, C, M, eps3)
    packed_out = np.asarray(kern(
        eng.d_dense_tf8, eng.d_len_code, eng.d_avg32,
        eng.d_dense_blockmax, eng.d_dense_blockmax2, eng.d_dense_argpos,
        d_slots, d_idf, d_ks))
    flags_exact = packed_out[:, T + 1, 0]
    _, flags_2l = full_two_level(d_slots, d_idf, d_ks)
    flags_2l = np.asarray(flags_2l)
    res["flag_rate_exact"] = round(
        float(((flags_exact & K.FLAG_PRUNE_MISS) != 0).mean()), 4)
    res["flag_rate_two_level"] = round(float((flags_2l != 0).mean()), 4)

    for k, v in res.items():
        log(f"  {k}: {v}")
    res["per_query_us_full"] = round(1e3 * res["full_ms"] / B, 1)
    print(json.dumps(res))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
