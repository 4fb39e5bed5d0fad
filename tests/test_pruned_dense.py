"""Block-max pruned dense scan: exactness of the prune guard.

The pruned kernel (kernels._pruned_dense_body) examines only the C
highest-upper-bound 128-doc blocks; FLAG_PRUNE_MISS must fire whenever
an unexamined block could beat or tie the kept set, routing the query to
the exact host path — so results are bit-exact in BOTH guard outcomes.
These tests force the pruned route on a small corpus (instance
overrides of PRUNED_DENSE_MIN_NB / PRUNED_DENSE_C) and check each
outcome separately. (Reference analog: block-max pruning replaces the
zigzag's skip-forward, query_processing.h:742-763, with a provable
device-side bound instead of data-dependent control flow.)
"""

import numpy as np
import pytest

import wiser_tpu.engine.kernels as K
from wiser_tpu.data.synth import make_docinfo
from wiser_tpu.engine.device import TpuEngine
from wiser_tpu.index.builder import build_index
from wiser_tpu.types import SearchQuery


def assert_same(oracle_res, res, msg=""):
    o = [(e.doc_id, e.doc_score) for e in oracle_res.entries]
    t = [(e.doc_id, e.doc_score) for e in res.entries]
    assert o == t, f"{msg}\noracle={o[:4]}\ntpu={t[:4]}"


def make_pruned_engine(docs, columns, C=4, min_nb=8):
    packed, oracle = build_index(docs)
    engine = TpuEngine(packed, columns=columns)
    engine.PRUNED_DENSE_MIN_NB = min_nb
    engine.PRUNED_DENSE_C = C
    # phrase: make head pairs count as "mega" so they route pruned
    engine.PRUNED_PHRASE_C = C
    engine.PHRASE_MAX_L = 64
    return packed, oracle, engine


@pytest.fixture(scope="module", params=["raw", "tc"])
def flat_corpus(request):
    """Uniform head-term corpus: block upper bounds are all similar, so
    the C-block prune CANNOT prove exactness — the guard must fire and
    the host path must restore bit parity."""
    rng = np.random.default_rng(23)
    docs = []
    for i in range(1600):
        toks = []
        if rng.random() < 0.9:
            toks.append("h0")
        if rng.random() < 0.8:
            toks.append("h1")
        if rng.random() < 0.7:
            toks.append("h2")
        toks += [f"r{rng.integers(200)}" for _ in range(rng.integers(3, 10))]
        rng.shuffle(toks)
        docs.append(make_docinfo(toks, with_blooms=False))
    return make_pruned_engine(docs, request.param)


@pytest.fixture(scope="module", params=["raw", "tc"])
def skewed_corpus(request):
    """First two 128-doc blocks hold high-tf short docs; the rest are
    low-tf long docs. The top-C ub blocks provably contain the whole
    top-k, so the pruned result must be used WITHOUT a host fallback."""
    docs = []
    for i in range(1600):
        if i < 256:
            toks = ["h0"] * 4 + ["h1"] * 4 + [f"f{j}" for j in range(i % 5)]
        else:
            toks = ["h0", "h1"] + [f"g{i}_{j}" for j in range(28 + i % 7)]
        docs.append(make_docinfo(toks, with_blooms=False))
    return make_pruned_engine(docs, request.param)


def spy_pruned(engine, monkeypatch):
    called = []
    name = ("make_pruned_dense_kernel_tc" if engine.columns == "tc"
            else "make_pruned_dense_kernel")
    orig = getattr(K, name)

    def spy(*a, **kw):
        called.append(a)
        return orig(*a, **kw)

    monkeypatch.setattr(K, name, spy)
    return called


def spy_host(engine, monkeypatch):
    calls = []
    orig = engine._host_exact

    def spy(rows, k, is_phrase=False):
        calls.append(tuple(rows))
        return orig(rows, k, is_phrase)

    monkeypatch.setattr(engine, "_host_exact", spy)
    return calls


def test_guard_fires_and_rescue_restores_parity(flat_corpus, monkeypatch):
    """Flat ub profile: the prune guard CANNOT certify, so the flagged
    rows must be rescued on-device by the exact full dense scan (no host
    fallback needed — the rescue is exact by construction). DENSE_RESCUE
    defaults ON (an honest host merge of a one-off head conjunction is
    2-20 ms; see device.py knob note)."""
    _, oracle, engine = flat_corpus
    monkeypatch.setattr(engine, "DENSE_RESCUE", True)
    pruned = spy_pruned(engine, monkeypatch)
    host = spy_host(engine, monkeypatch)
    engine.stats_take()
    for terms in (["h0", "h1"], ["h1", "h2"], ["h0", "h1", "h2"],
                  ["h2", "h0"]):
        q = SearchQuery(terms, n_results=10)
        assert_same(oracle.search(q), engine.search(q), f"AND {terms}")
    assert pruned, "pruned kernel must be engaged at the forced thresholds"
    stats = engine.stats_take()
    assert stats.get("prune_rescued", 0) > 0, \
        "flat ub profile must trip FLAG_PRUNE_MISS -> dense rescue"
    assert not host, "the exact dense rescue must obviate the host path"


def test_guard_fires_default_host_fallback(flat_corpus, monkeypatch):
    """With DENSE_RESCUE off (the opt-out for backends whose dense tier
    can't host a full re-scan): flagged rows go straight to the memoized
    host merge and stay bit-exact."""
    _, oracle, engine = flat_corpus
    monkeypatch.setattr(engine, "DENSE_RESCUE", False)
    host = spy_host(engine, monkeypatch)
    engine.stats_take()
    for terms in (["h0", "h1"], ["h1", "h2"], ["h0", "h1", "h2"]):
        q = SearchQuery(terms, n_results=10)
        assert_same(oracle.search(q), engine.search(q), f"AND {terms}")
    stats = engine.stats_take()
    assert stats.get("flag_prune_miss", 0) > 0
    assert stats.get("prune_rescued", 0) == 0
    assert host, "guard misses must fall back to the host merge"


def test_prune_keeps_exact_without_fallback(skewed_corpus, monkeypatch):
    _, oracle, engine = skewed_corpus
    pruned = spy_pruned(engine, monkeypatch)
    host = spy_host(engine, monkeypatch)
    q = SearchQuery(["h0", "h1"], n_results=10)
    assert_same(oracle.search(q), engine.search(q))
    assert pruned, "pruned kernel must be engaged"
    assert not host, ("skewed ub profile must prove exactness on-device "
                      "(no host fallback)")


def test_pruned_batch_k_variety(flat_corpus):
    _, oracle, engine = flat_corpus
    queries = [SearchQuery(["h0", "h1"], n_results=k) for k in (1, 5, 37)]
    queries += [SearchQuery(["h1", "h2", "h0"], n_results=10)]
    queries += [SearchQuery(["h0", f"r{i}"], n_results=10) for i in range(4)]
    batch = engine.search_batch(queries)
    for q, r in zip(queries, batch):
        assert_same(oracle.search(q), r, f"{q.terms} k={q.n_results}")


def test_prune_flag_forces_host_mask(flat_corpus):
    _, _, engine = flat_corpus
    flags = np.array([0, K.FLAG_PRUNE_MISS, K.FLAG_TRUNC,
                      K.FLAG_PRUNE_MISS | K.FLAG_TRUNC])
    force = engine._flags_to_force(flags)
    assert force.tolist() == [False, True, False, True]


def spy_pruned_phrase(engine, monkeypatch):
    """Watch BOTH mega-phrase kernel families: the default full-scan
    (FULL_PHRASE_SCAN) and the block-pruned fallback."""
    called = []
    suffix = "_tc" if engine.columns == "tc" else ""
    for base in ("make_full_phrase_kernel", "make_pruned_phrase_kernel"):
        name = base + suffix
        orig = getattr(K, name)

        def spy(*a, _orig=orig, **kw):
            called.append(a)
            return _orig(*a, **kw)

        monkeypatch.setattr(K, name, spy)
    return called


def test_pruned_phrase_parity_flat(flat_corpus, monkeypatch):
    """Mega phrase pairs on the flat corpus: pruned route engages; the
    guard + host path keep bit parity whichever way each query goes."""
    _, oracle, engine = flat_corpus
    called = spy_pruned_phrase(engine, monkeypatch)
    for terms in (["h0", "h1"], ["h1", "h2"], ["h1", "h0"],
                  ["h0", "h1", "h2"]):
        q = SearchQuery(terms, n_results=10, is_phrase=True)
        assert_same(oracle.search(q), engine.search(q), f"phrase {terms}")
    assert called, "mega all-dense phrases must route pruned"


def test_pruned_phrase_no_fallback_when_provable(skewed_corpus,
                                                 monkeypatch):
    """Skewed corpus: the phrase h0 h1 occurs in every doc, so the top-C
    ub blocks hold the whole top-k and no host fallback is needed."""
    _, oracle, engine = skewed_corpus
    called = spy_pruned_phrase(engine, monkeypatch)
    host = spy_host(engine, monkeypatch)
    q = SearchQuery(["h0", "h1"], n_results=10, is_phrase=True)
    assert_same(oracle.search(q), engine.search(q))
    assert called, "pruned phrase kernel must be engaged"
    assert not host, "frequent-phrase skewed profile must prove on-device"


def test_pruned_phrase_zero_matches(skewed_corpus):
    """h1 h0 never occurs adjacently in the skewed corpus: the kernel
    finds no matches, the guard flags, and the host confirms empty."""
    _, oracle, engine = skewed_corpus
    q = SearchQuery(["h1", "h0"], n_results=10, is_phrase=True)
    o, t = oracle.search(q), engine.search(q)
    assert [e.doc_id for e in o.entries] == [e.doc_id for e in t.entries]
    assert not t.entries


def test_pruned_phrase_batch_mixed(flat_corpus):
    """Pruned phrases alongside AND + tail queries in one batch."""
    _, oracle, engine = flat_corpus
    queries = [SearchQuery(["h0", "h1"], n_results=10, is_phrase=True),
               SearchQuery(["h1", "h2"], n_results=3, is_phrase=True),
               SearchQuery(["h0", "h2"], n_results=10),
               SearchQuery(["h0", "r7"], n_results=10)]
    batch = engine.search_batch(queries)
    for q, r in zip(queries, batch):
        assert_same(oracle.search(q), r, f"{q.terms} phrase={q.is_phrase}")


def test_batch_request_coalescing(flat_corpus, monkeypatch):
    """Identical queries in one batch execute once and fan out with
    identical results (incl. the single-term table path)."""
    _, oracle, engine = flat_corpus
    q1 = SearchQuery(["h0", "h1"], n_results=10)
    q2 = SearchQuery(["h0"], n_results=10)
    q3 = SearchQuery(["h0", "h1"], n_results=5)  # different k: NOT a dup
    batch = [q1, q2, SearchQuery(["h0", "h1"], n_results=10), q3, q2]
    calls = []
    orig = engine._submit_flat_vec

    def spy(flat_qi, *a, **kw):
        calls.append(list(flat_qi))
        return orig(flat_qi, *a, **kw)

    monkeypatch.setattr(engine, "_submit_flat_vec", spy)
    res = engine.search_batch(batch)
    # only 2 distinct multi-term queries planned (q1 and q3)
    assert len(calls) == 1 and len(calls[0]) == 2
    for q, r in zip(batch, res):
        assert_same(oracle.search(q), r, f"{q.terms} k={q.n_results}")


def test_blockmax_dominates_tc_reconstruction(skewed_corpus):
    """tc mode: the host-built blockmax plane must upper-bound the
    device's in-kernel f32 score reconstruction for every lane."""
    _, _, engine = skewed_corpus
    if engine.columns != "tc":
        pytest.skip("tc-mode bound check")
    import jax.numpy as jnp

    H = engine._dense_H
    NB = engine._n_pad_docs // 128
    # recompose the uint16 tc lanes from the uint8 tf plane + the shared
    # len-code row (the served layout stores them separately)
    tf8 = engine._h_dense_tf_rows.astype(np.int32)
    code16 = engine._h_len_code.astype(np.int32) << 8
    tc = jnp.asarray(np.where(tf8 > 0, code16[None, :] | tf8, 0))
    for h in range(H):
        r = np.nonzero(engine._dense_slot == h)[0][0]
        idf = np.float32(engine.packed.idf64[r])
        sc = np.asarray(K.tc_score(tc[h], jnp.float32(idf),
                                   jnp.float32(engine._avg32)))
        got = sc.reshape(NB, 128).max(axis=1)
        bound = engine._h_dense_blockmax[h]
        assert (got <= bound).all(), f"row {h}: bound violated"


def test_select_ub_blocks_joint_presence_mask():
    """Conjunction feasibility in block selection: a block missing any
    live term cannot match, so its ub must be 0 — the loudest
    single-term blocks must NOT crowd out the only joint block, and
    next_ub must be 0 once every feasible block is examined."""
    import jax.numpy as jnp

    # 2 terms x 4 blocks: term0 peaks in block0, term1 in block1,
    # both present (small) only in block2; block3 empty.
    blockmax = jnp.asarray(np.array([
        [9.0, 0.0, 1.0, 0.0],   # term 0
        [0.0, 9.0, 1.0, 0.0],   # term 1
    ], dtype=np.float32))
    slots = jnp.asarray(np.array([[0, 1]], dtype=np.int32))
    weights = jnp.ones((1, 2), dtype=np.float32)
    blk, next_ub = K._select_ub_blocks(blockmax, slots, weights,
                                       T=2, NB=4, C=1)
    assert int(blk[0, 0]) == 2, "only the joint block is feasible"
    assert float(next_ub[0]) == 0.0, \
        "all feasible blocks examined -> nothing left to flag about"
    # a padded slot (weight 0) must not constrain feasibility
    w_pad = jnp.asarray(np.array([[1.0, 0.0]], dtype=np.float32))
    blk, next_ub = K._select_ub_blocks(blockmax, slots, w_pad,
                                       T=2, NB=4, C=1)
    assert int(blk[0, 0]) == 0, "padded term 1 ignored: term0's peak wins"
    assert float(next_ub[0]) == pytest.approx(1.0)


@pytest.fixture(scope="module", params=["raw", "tc"])
def disjoint_support_corpus(request):
    """Blocks 0-1 hold high-tf h0-only docs, blocks 2-3 high-tf h1-only
    docs; the ONLY docs with both live in blocks 4+ at tf 1. Without the
    joint-presence mask the top-C ub blocks are all infeasible and the
    guard flags every query; with it the C blocks cover the whole
    intersection and the guard proves exactness on-device."""
    docs = []
    for i in range(1600):
        if i < 256:
            toks = ["h0"] * 6 + [f"f{i % 17}"]
        elif i < 512:
            toks = ["h1"] * 6 + [f"f{i % 13}"]
        elif i < 608 and i % 2 == 0:
            toks = ["h0", "h1"] + [f"g{i % 11}"] * 3
        else:
            toks = [f"g{i % 23}"] * 5
        docs.append(make_docinfo(toks, with_blooms=False))
    # dense eligibility is decided in __init__ — lower the floor at the
    # class level for construction (h0/h1 df ~300 < the 1024 default)
    old = TpuEngine.DENSE_MIN_DF_FLOOR
    TpuEngine.DENSE_MIN_DF_FLOOR = 64
    try:
        packed, oracle, engine = make_pruned_engine(docs, request.param)
    finally:
        TpuEngine.DENSE_MIN_DF_FLOOR = old
    engine.SEMI_FROM_DENSE_MAX_CAND_L = 0  # force all-dense -> pruned
    return packed, oracle, engine


def test_prune_mask_proves_disjoint_support(disjoint_support_corpus,
                                            monkeypatch):
    _, oracle, engine = disjoint_support_corpus
    pruned = spy_pruned(engine, monkeypatch)
    host = spy_host(engine, monkeypatch)
    engine.stats_take()
    for k in (5, 10):
        q = SearchQuery(["h0", "h1"], n_results=k)
        assert_same(oracle.search(q), engine.search(q), f"AND k={k}")
    stats = engine.stats_take()
    assert pruned, "pruned kernel must be engaged"
    assert stats.get("flag_prune_miss", 0) == 0, \
        "feasibility mask must keep next_ub at 0 (nothing to flag)"
    assert not host, "no host fallback on the masked route"
