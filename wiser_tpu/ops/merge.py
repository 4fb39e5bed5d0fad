"""Pallas staircase merge — device-side sorted-list intersection with
work proportional to (df_cand + df_other), the true zigzag analog
(TwoTermNonPhraseQueryProcessor, query_processing.h:644-678) at full
vector width.

Why: the XLA windowed compare (kernels.windowed_search_body) examines
WIN*128 other-lanes per candidate; for very long similar lists (wiki-
scale head-term pairs) that is ~300x the merge's work. This kernel walks
both lists once, block-by-block:

  grid cell = (query, non-candidate slot)
  - DMA the candidate's 128-doc blocks and the other list's 1024-doc
    chunks from HBM into VMEM (dynamic row offsets on a (P/128, 128)
    posting view — validated on this TPU),
  - lax.while_loop advances whichever side's current max doc id is
    smaller (the staircase); on overlap, a 128x(8x128) VPU equality
    compare accumulates the matched (partial score, tf) into the
    candidate-lane accumulators,
  - trip count <= ceil(df_cand/128) + ceil(df_other/1024).

Outputs (C, L) score/tf lanes (C = B*(T-1)); downstream combination,
masking and top-k stay in XLA exactly as for the windowed path
(match == score > 0; partial scores strictly positive).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from wiser_tpu.utils import serial_jit

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128  # posting pack width (row width of the (P/128, 128) views)
# Measured on v5e (C=1024 cells, L=32768, 20k-doc head pairs):
#   CB_ROWS=1, CHUNK_ROWS=8:  835 ms   <- best; loop overhead ~4.6us/iter
#   CB_ROWS=4, CHUNK_ROWS=16: 1501 ms  (the unrolled 64x (128,128) compare
#                                       costs more than the iterations saved
#                                       — Mosaic's broadcast eq is ~35G ops/s)
CB_ROWS = 1  # candidate rows per iteration
CHUNK_ROWS = 8  # other-list chunk rows per DMA
SENTINEL = np.int32(2**31 - 1)


def _merge_kernel(L: int):
    NB = L // (BLK * CB_ROWS)  # candidate super-blocks per cell

    def kernel(meta_ref,  # scalar prefetch: (C, 4) int32
               doc_rows, score_rows, tf_rows,  # HBM (P/128, 128) views
               score_out, tf_out,  # VMEM (1, NB, 128)
               cand_buf, odoc_buf, osc_buf, otf_buf,  # double-buffered
               acc_sc, acc_tf,  # VMEM scratch (1, 128)
               sems):
        c = pl.program_id(0)
        cand_row0 = meta_ref[c, 0] >> 7  # candidate start block row
        nb_c_rows = (meta_ref[c, 1] + BLK - 1) // BLK  # real+pad 128-rows
        nb_c = (nb_c_rows + CB_ROWS - 1) // CB_ROWS  # candidate super-blocks
        o_row0 = meta_ref[c, 2] >> 7
        nb_o_rows = (meta_ref[c, 3] + BLK - 1) // BLK  # other 128-rows
        n_chunks = (nb_o_rows + CHUNK_ROWS - 1) // CHUNK_ROWS

        def dma_cand(i, slot):
            return pltpu.make_async_copy(
                doc_rows.at[pl.ds(cand_row0 + i * CB_ROWS, CB_ROWS), :],
                cand_buf.at[slot], sems.at[slot])

        def dma_chunk(j, slot):
            row = o_row0 + j * CHUNK_ROWS
            return (
                pltpu.make_async_copy(
                    doc_rows.at[pl.ds(row, CHUNK_ROWS), :],
                    odoc_buf.at[slot], sems.at[2 + slot]),
                pltpu.make_async_copy(
                    score_rows.at[pl.ds(row, CHUNK_ROWS), :],
                    osc_buf.at[slot], sems.at[4 + slot]),
                pltpu.make_async_copy(
                    tf_rows.at[pl.ds(row, CHUNK_ROWS), :],
                    otf_buf.at[slot], sems.at[6 + slot]),
            )

        # zero the whole output block first
        score_out[...] = jnp.zeros((1, NB, CB_ROWS, BLK), jnp.float32)
        tf_out[...] = jnp.zeros((1, NB, CB_ROWS, BLK), jnp.int32)

        d = dma_cand(0, 0)
        d.start()
        d.wait()
        for dd in dma_chunk(0, 0):
            dd.start()
        for dd in dma_chunk(0, 0):
            dd.wait()
        acc_sc[...] = jnp.zeros((CB_ROWS, BLK), jnp.float32)
        acc_tf[...] = jnp.zeros((CB_ROWS, BLK), jnp.int32)

        def compare_accumulate(j, cslot, oslot):
            # rows past the other list's padded run belong to the NEXT
            # term — mask them so they can never match. Unrolled over
            # (cand row x chunk row) pairs: Mosaic handles (128,128)
            # broadcasts but rejects lane-crossing reshapes.
            for cr in range(CB_ROWS):
                cand_r = cand_buf[cslot, cr, :]  # (128,)
                acc_s = acc_sc[cr, :]
                acc_t = acc_tf[cr, :]
                for r in range(CHUNK_ROWS):
                    row_ok = (j * CHUNK_ROWS + r) < nb_o_rows
                    eq = (cand_r[:, None] == odoc_buf[oslot, r, :][None, :]) \
                        & row_ok
                    acc_s = acc_s + jnp.max(
                        jnp.where(eq, osc_buf[oslot, r, :][None, :], 0.0),
                        axis=1)
                    acc_t = acc_t + jnp.max(
                        jnp.where(eq, otf_buf[oslot, r, :][None, :], 0),
                        axis=1)
                acc_sc[cr, :] = acc_s
                acc_tf[cr, :] = acc_t

        def flush(i):
            score_out[0, i, :, :] = acc_sc[...]
            tf_out[0, i, :, :] = acc_tf[...]
            acc_sc[...] = jnp.zeros((CB_ROWS, BLK), jnp.float32)
            acc_tf[...] = jnp.zeros((CB_ROWS, BLK), jnp.int32)

        def body(state):
            # double-buffered staircase: decide the advance direction from
            # the resident buffers' maxima, START the next DMA into the
            # alternate slot, overlap it with the compare, then wait.
            i, j, cslot, oslot = state
            # last valid candidate row of this super-block (later rows may
            # bleed into the next term's run — never trust their values)
            c_last = jnp.minimum(
                jnp.int32(CB_ROWS), nb_c_rows - i * CB_ROWS) - 1
            cand_max = cand_buf[cslot, c_last, BLK - 1]
            last_valid = jnp.minimum(
                jnp.int32(CHUNK_ROWS), nb_o_rows - j * CHUNK_ROWS) - 1
            chunk_max = odoc_buf[oslot, last_valid, BLK - 1]
            adv_cand = cand_max <= chunk_max
            fetch_cand = adv_cand & (i + 1 < nb_c)
            fetch_chunk = (~adv_cand) & (j + 1 < n_chunks)

            @pl.when(fetch_cand)
            def _():
                dma_cand(i + 1, 1 - cslot).start()

            @pl.when(fetch_chunk)
            def _():
                for dd in dma_chunk(j + 1, 1 - oslot):
                    dd.start()

            compare_accumulate(j, cslot, oslot)

            @pl.when(adv_cand)
            def _():
                flush(i)

            @pl.when(fetch_cand)
            def _():
                dma_cand(i + 1, 1 - cslot).wait()

            @pl.when(fetch_chunk)
            def _():
                for dd in dma_chunk(j + 1, 1 - oslot):
                    dd.wait()

            i2 = jnp.where(adv_cand, i + 1, i)
            j2 = jnp.where(adv_cand, j, j + 1)
            cslot2 = jnp.where(fetch_cand, 1 - cslot, cslot)
            oslot2 = jnp.where(fetch_chunk, 1 - oslot, oslot)
            return i2, j2, cslot2, oslot2

        def cond(state):
            i, j, _, _ = state
            return (i < nb_c) & (j < n_chunks)

        i, j, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0)))

        # if the other list ran out first, flush the current candidate
        # block's partial accumulation (remaining blocks have no matches)
        @pl.when(i < nb_c)
        def _():
            flush(i)

    return kernel


@lru_cache(maxsize=16)
def make_merge_intersect(L: int, interpret: bool = False):
    """fn(meta (C,4) i32 [cand_start, cand_df, other_start, other_df],
          doc_rows (P/128,128) i32, score_rows f32, tf_rows i32)
       -> (score (C, L) f32, tf (C, L) i32)

    Starts must be 128-aligned (the index builder guarantees this).
    Chunks may read up to CHUNK_ROWS-1 rows past a list's end — the
    engine pads device columns with a full L-bucket of sentinel slack.
    """
    assert L % (BLK * CB_ROWS) == 0, "L must be a multiple of CB_ROWS*128"
    NB = L // (BLK * CB_ROWS)
    kern = _merge_kernel(L)

    def f(meta, doc_rows, score_rows, tf_rows):
        C = meta.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((1, NB, CB_ROWS, BLK), lambda c, s: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NB, CB_ROWS, BLK), lambda c, s: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, CB_ROWS, BLK), jnp.int32),      # cand docs x2
                pltpu.VMEM((2, CHUNK_ROWS, BLK), jnp.int32),   # other docs x2
                pltpu.VMEM((2, CHUNK_ROWS, BLK), jnp.float32),
                pltpu.VMEM((2, CHUNK_ROWS, BLK), jnp.int32),
                pltpu.VMEM((CB_ROWS, BLK), jnp.float32),       # score accum
                pltpu.VMEM((CB_ROWS, BLK), jnp.int32),         # tf accum
                pltpu.SemaphoreType.DMA((8,)),
            ],
        )
        score, tf = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((C, NB, CB_ROWS, BLK), jnp.float32),
                jax.ShapeDtypeStruct((C, NB, CB_ROWS, BLK), jnp.int32),
            ),
            interpret=interpret,
        )(meta, doc_rows, score_rows, tf_rows)
        return score.reshape(C, L), tf.reshape(C, L)

    return serial_jit(f)
