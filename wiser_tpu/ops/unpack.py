"""Device-side decode of bit-packed posting blocks — the LittleIntPacker
(turbounpack32) analog, SURVEY.md §2's "#1 native kernel to replace".

Storage format (matches codecs.pack_block / native wiser_pack128): each
128-value block is packed at a fixed width w; value i occupies bits
[i*w, (i+1)*w) of a little-endian stream of 4*w uint32 words. Doc ids are
stored as block-local deltas (delta-1 for strictly-ascending ids) against
a per-block first-doc column, so a block decodes independently — exactly
the reference's pack + skip-entry structure (packed_value.h:87-274,
flash_containers.h:236).

Because the width is static per kernel, every value's (word index, bit
offset) pair is a compile-time constant: the unpack is expressed as two
constant-index gathers + shifts + mask — no data-dependent indexing, so
it vectorizes on the VPU. Provided in two forms:

- unpack_blocks_xla: plain jitted jnp (usable everywhere today)
- unpack_blocks_pallas: a Pallas kernel (VMEM-resident, grid over block
  tiles); `interpret=True` runs it on CPU for tests. Validated bit-exact
  on real TPU hardware (v5e, 2026-08-16; Mosaic requires the dynamic
  gather as a shape-matched take_along_axis over 128-lane rows).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from wiser_tpu.utils import serial_jit

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128


def _static_layout(width: int):
    """(word_idx[128], bit_off[128], needs_hi[128]) as numpy constants."""
    bitpos = np.arange(BLOCK, dtype=np.int64) * width
    word_idx = (bitpos >> 5).astype(np.int32)
    bit_off = (bitpos & 31).astype(np.int32)
    needs_hi = (bit_off + width > 32).astype(np.uint32)
    return word_idx, bit_off, needs_hi


def _unpack_math(words, width: int):
    """words: (..., 4*width) uint32 -> (..., 128) uint32. Constant-index
    gathers only."""
    word_idx, bit_off, needs_hi = _static_layout(width)
    mask = np.uint32(0xFFFFFFFF) if width == 32 else np.uint32((1 << width) - 1)
    lo_w = jnp.take(words, jnp.asarray(word_idx), axis=-1)
    hi_idx = np.minimum(word_idx + 1, 4 * width - 1)
    hi_w = jnp.take(words, jnp.asarray(hi_idx), axis=-1)
    off = jnp.asarray(bit_off, dtype=jnp.uint32)
    lo = lo_w >> off
    # (32 - off) can be 32 when off == 0: mask those lanes out instead
    hi_shift = jnp.asarray((32 - bit_off) % 32, dtype=jnp.uint32)
    hi = jnp.where(jnp.asarray(needs_hi, dtype=bool), hi_w << hi_shift, jnp.uint32(0))
    return (lo | hi) & mask


@lru_cache(maxsize=40)
def _xla_unpack(width: int):
    @jax.jit
    def f(words):  # (G, 4*width) uint32
        return _unpack_math(words, width)

    return f


def unpack_blocks_xla(words: jnp.ndarray, width: int) -> jnp.ndarray:
    """(G, 4*width) uint32 -> (G, 128) uint32."""
    return _xla_unpack(width)(words)


def _pallas_kernel(width: int, tile: int):
    mask = np.uint32(0xFFFFFFFF) if width == 32 else np.uint32((1 << width) - 1)

    def kernel(words_ref, lo_idx_ref, hi_idx_ref, off_ref, hishift_ref,
               needhi_ref, out_ref):
        # Mosaic's dynamic gather wants input/indices/output shape-matched,
        # so blocks ride as 128-lane rows (4*width <= 128 always) and the
        # per-lane source column is a take_along_axis over the lane dim.
        words = words_ref[:]
        lo_idx = jnp.broadcast_to(lo_idx_ref[0][None, :], (tile, BLOCK))
        hi_idx = jnp.broadcast_to(hi_idx_ref[0][None, :], (tile, BLOCK))
        lo_w = jnp.take_along_axis(words, lo_idx, axis=1)
        hi_w = jnp.take_along_axis(words, hi_idx, axis=1)
        lo = lo_w >> off_ref[0][None, :]
        hi = jnp.where(needhi_ref[0][None, :] != 0,
                       hi_w << hishift_ref[0][None, :], jnp.uint32(0))
        out_ref[:] = (lo | hi) & mask

    return kernel


@lru_cache(maxsize=40)
def _pallas_unpack(width: int, tile: int, interpret: bool):
    kern = _pallas_kernel(width, tile)
    word_idx, bit_off, needs_hi = _static_layout(width)
    hi_idx = np.minimum(word_idx + 1, 4 * width - 1)
    hi_shift = ((32 - bit_off) % 32).astype(np.uint32)
    # layout vectors ride as (1, 128) VMEM inputs (Pallas kernels cannot
    # capture traced constants)
    consts = tuple(
        a.reshape(1, BLOCK)
        for a in (word_idx.astype(np.int32), hi_idx.astype(np.int32),
                  bit_off.astype(np.uint32), hi_shift,
                  needs_hi.astype(np.uint32))
    )

    def f(words):  # (G, 4*width) uint32, G % tile == 0
        G = words.shape[0]
        if words.shape[1] < BLOCK:  # pad block rows to full 128 lanes
            words = jnp.pad(words, ((0, 0), (0, BLOCK - words.shape[1])))
        const_specs = [
            pl.BlockSpec((1, BLOCK), lambda g: (0, 0), memory_space=pltpu.VMEM)
            for _ in consts
        ]
        return pl.pallas_call(
            kern,
            grid=(G // tile,),
            in_specs=[pl.BlockSpec((tile, BLOCK), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM)] + const_specs,
            out_specs=pl.BlockSpec((tile, BLOCK), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, BLOCK), jnp.uint32),
            interpret=interpret,
        )(words, *consts)

    return serial_jit(f)


def unpack_blocks_pallas(words: jnp.ndarray, width: int, tile: int = 8,
                         interpret: bool = False) -> jnp.ndarray:
    """Pallas variant; words (G, 4*width) with G a multiple of `tile`."""
    return _pallas_unpack(width, tile, interpret)(words)


def delta_decode_docs(deltas_u32: jnp.ndarray, block_first: jnp.ndarray) -> jnp.ndarray:
    """(G, 128) packed deltas (delta-1 of ascending ids, first lane is the
    delta from block_first... lane 0 stores 0) + (G,) first ids ->
    (G, 128) absolute int32 doc ids."""
    d = deltas_u32.astype(jnp.int32)
    inc = jnp.cumsum(d + 1, axis=1) - (d[:, :1] + 1)
    return block_first[:, None] + inc


# -- host-side packing for the compressed posting column -------------------


def doc_block_deltas(postings_doc: np.ndarray):
    """(G, 128) block-local delta-1 values + (G,) block-first ids for a
    128-aligned, sentinel-padded doc column. Sentinel lanes carry the
    previous real id (delta 0) so they pack at zero cost; consumers mask
    by run length as usual."""
    from wiser_tpu.index.format import SENTINEL_DOC

    P = len(postings_doc)
    assert P % BLOCK == 0
    blocks = postings_doc.reshape(-1, BLOCK).astype(np.int64)
    real = blocks != SENTINEL_DOC
    carried = np.where(real, blocks, 0)
    np.maximum.accumulate(carried, axis=1, out=carried)
    first = carried[:, 0]
    deltas = np.diff(carried, axis=1, prepend=carried[:, :1])
    deltas = np.where(deltas > 0, deltas - 1, 0).astype(np.uint32)
    return deltas, first.astype(np.int32)


def doc_block_widths(postings_doc: np.ndarray) -> np.ndarray:
    """(G,) uint8 per-128-block pack width (bits) of the delta stream."""
    deltas, _ = doc_block_deltas(postings_doc)
    return np.maximum(
        1,
        np.ceil(np.log2(deltas.max(axis=1).astype(np.float64) + 1.0)),
    ).astype(np.uint8)


def pack_doc_blocks(postings_doc: np.ndarray) -> dict:
    """Pack 128-aligned doc-id columns (sentinel-padded, as produced by the
    index builder) into width-bucketed delta blocks. Returns
    {width -> (block_ids int32[gw], words uint32[gw, 4*width])} plus the
    per-block first-doc column. Sentinel lanes pack as delta 0 (decoded
    values then repeat the previous id; consumers mask by df as usual)."""
    from wiser_tpu.native import lib as native

    deltas, first = doc_block_deltas(postings_doc)

    widths = np.maximum(
        1,
        np.ceil(np.log2(deltas.max(axis=1).astype(np.float64) + 1.0)),
    ).astype(np.uint8)
    out = {}
    for w in np.unique(widths):
        sel = np.nonzero(widths == w)[0].astype(np.int32)
        vals = deltas[sel].reshape(-1)
        words = native.pack_blocks(vals, np.full(len(sel), w, dtype=np.uint8))
        out[int(w)] = (sel, words.reshape(len(sel), 4 * int(w)))
    return {"groups": out, "block_first": first.astype(np.int32),
            "widths": widths}


def unpack_doc_blocks(packed: dict, use_pallas: bool = False,
                      interpret: bool = False) -> np.ndarray:
    """Inverse of pack_doc_blocks -> int32[G*128] doc column (sentinel
    lanes hold the carried previous id, NOT the sentinel)."""
    G = len(packed["block_first"])
    out = np.zeros((G, BLOCK), dtype=np.int32)
    for w, (sel, words) in packed["groups"].items():
        jw = jnp.asarray(words)
        if use_pallas:
            pad = (-len(sel)) % 8
            if pad:
                jw = jnp.concatenate([jw, jnp.zeros((pad, jw.shape[1]), jw.dtype)])
            vals = unpack_blocks_pallas(jw, w, interpret=interpret)[: len(sel)]
        else:
            vals = unpack_blocks_xla(jw, w)
        firsts = jnp.asarray(packed["block_first"][sel])
        out[sel] = np.asarray(delta_decode_docs(vals, firsts))
    return out.reshape(-1)
