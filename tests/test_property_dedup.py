"""Property-based cross-checks for the near-dup operators.

The driver's DuckDB oracle already pins these on the fixed testdata;
hypothesis additionally drives them with adversarial tiny corpora
(repeated tokens, identical docs, whitespace noise) and compares
against an independent brute-force Python implementation — the
generalization of the reference's recompute-by-hand QC idiom
(3_blood_pressure.R:177-182, SURVEY.md §5.4).
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hypertension_dashboard_pipeline_spark.operators import dedup as dd

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

doc_strategy = st.lists(
    st.sampled_from(VOCAB), min_size=0, max_size=10
).map(" ".join)

corpus_strategy = st.lists(doc_strategy, min_size=2, max_size=6)


def _tokens(text: str) -> list[str]:
    return text.split()


def _shingles(text: str, k: int = 3) -> set[str]:
    toks = _tokens(text)
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _base_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _hash64(s: str) -> int:
    """First 16 md5 hex digits as a big-endian unsigned 64-bit value —
    the SimHash token hash (operators/dedup.py simhash_signatures)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:16], 16)


def _corpus_df(spark, corpus):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=corpus_strategy)
def test_jaccard_pairs_match_bruteforce(spark, corpus):
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.shingle_pairs_jaccard(
            _corpus_df(spark, corpus), threshold=0.0, persist=False
        ).collect()
    }
    want = {}
    for a in range(len(corpus)):
        for b in range(a + 1, len(corpus)):
            sa, sb = _shingles(corpus[a]), _shingles(corpus[b])
            inter = len(sa & sb)
            if inter:  # operator only emits pairs sharing >=1 shingle
                want[(a, b)] = round(inter / len(sa | sb), 6)
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=corpus_strategy)
def test_minhash_signatures_match_bruteforce(spark, corpus):
    n_hashes = 8
    rows = dd.minhash_signatures(
        _corpus_df(spark, corpus), n_hashes=n_hashes
    ).collect()
    got = {r.id: [r[f"h{i}"] for i in range(n_hashes)] for r in rows}
    params = dd.perm_params(n_hashes)
    want = {}
    for i, text in enumerate(corpus):
        sh = _shingles(text)
        if not sh:
            continue
        xs = [_base_hash(s) % dd.MINHASH_PRIME for s in sh]
        want[i] = [
            min((a * x + b) % dd.MINHASH_PRIME for x in xs) for a, b in params
        ]
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=corpus_strategy)
def test_simhash_signatures_match_bruteforce(spark, corpus):
    rows = dd.simhash_signatures(_corpus_df(spark, corpus)).collect()
    got = {r.id: r.simhash for r in rows}
    want = {}
    for i, text in enumerate(corpus):
        toks = set(_tokens(text))
        if not toks:
            continue
        sig = 0
        for b in range(dd.SIMHASH_BITS):
            votes = sum(
                1 if (_hash64(t) >> b) & 1 else -1 for t in toks
            )
            if votes >= 0:
                sig += 1 << b
        # signatures come back as signed 64-bit (bit 63 = sign bit)
        if sig >= 1 << 63:
            sig -= 1 << 64
        want[i] = sig
    assert got == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=corpus_strategy)
def test_simhash_pairs_match_bruteforce(spark, corpus):
    """The chunk-pair blocking is lossless (max_hamming < chunks), so
    the emitted set must EQUAL the exhaustive hamming filter — checked
    against an independent all-pairs computation."""
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in dd.simhash_pairs(
            _corpus_df(spark, corpus), persist=False
        ).collect()
    }
    sig = {}
    for i, text in enumerate(corpus):
        toks = set(_tokens(text))
        if not toks:
            continue
        s = 0
        for b in range(dd.SIMHASH_BITS):
            votes = sum(1 if (_hash64(t) >> b) & 1 else -1 for t in toks)
            if votes >= 0:
                s += 1 << b
        sig[i] = s
    want = {}
    ids = sorted(sig)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            h = bin(sig[a] ^ sig[b]).count("1")
            if h <= 6:
                want[(a, b)] = h
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=corpus_strategy)
def test_exact_dedup_keeps_one_per_distinct_text(spark, corpus):
    out = dd.exact_dedup(_corpus_df(spark, corpus)).collect()
    # one survivor per distinct text, and it is the min doc_id
    want_ids = sorted(
        min(i for i, t in enumerate(corpus) if t == text)
        for text in set(corpus)
    )
    assert sorted(r.doc_id for r in out) == want_ids


edge_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=12,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edges=edge_strategy)
def test_connected_components_match_union_find(spark, edges):
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {
        r.id: r.component
        for r in dd.connected_components(
            pairs, small_graph_threshold=0
        ).collect()
    }

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want


def test_connected_components_chain_pointer_halving(spark):
    """A 1000-link chain is the worst case for plain min-label
    propagation (diameter rounds); the pointer-halving step that
    switches on after ``halving_after`` rounds must converge in
    O(log n) total rounds AND produce the exact labeling."""
    n = 1000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    stats = {}
    got = {
        r.id: r.component
        for r in dd.connected_components(
            pairs, max_iterations=25, halving_after=2, stats=stats,
            small_graph_threshold=0,
        ).collect()
    }
    assert stats["converged"], "chain did not converge"
    # log2(1000) ~ 10; allow slack for the pre-halving warm-up rounds
    # and the alternating-round convergence check
    assert stats["iterations"] <= 20, stats
    assert got == {i: 0 for i in range(n + 1)}


def test_connected_components_warns_when_not_converged(spark):
    import warnings

    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    # halving disabled and too few rounds for a 30-link chain
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dd.connected_components(
            pairs, max_iterations=3, halving_after=99,
            small_graph_threshold=0,
        ).collect()
    assert any("did not converge" in str(x.message) for x in w)
    with pytest.raises(RuntimeError, match="did not converge"):
        dd.connected_components(
            pairs, max_iterations=3, halving_after=99,
            require_convergence=True, small_graph_threshold=0,
        )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=corpus_strategy)
def test_simhash_groups_match_bruteforce(spark, corpus):
    """Group output must equal: brute-force signatures -> hamming<=6
    graph over distinct signatures -> transitive closure -> min doc id
    per family, with EVERY doc (incl. singletons) labeled."""
    got = {
        r.id: r.group_id
        for r in dd.simhash_groups(
            _corpus_df(spark, corpus), persist=False
        ).collect()
    }
    sig = {}
    for i, text in enumerate(corpus):
        toks = set(_tokens(text))
        if not toks:
            continue
        s = 0
        for b in range(dd.SIMHASH_BITS):
            votes = sum(1 if (_hash64(t) >> b) & 1 else -1 for t in toks)
            if votes >= 0:
                s += 1 << b
        sig[i] = s

    # union-find over DOCS joined when signature hamming <= 6 (identical
    # signatures => hamming 0, also joined)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(sig)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if bin(sig[a] ^ sig[b]).count("1") <= 6:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in ids}
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edges=edge_strategy)
def test_components_local_fast_path_matches_distributed(spark, edges):
    """The small-graph union-find short-circuit must be output-
    identical to the iterative propagation on the same pairs."""
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    )
    stats_local, stats_dist = {}, {}
    local = {
        r.id: r.component
        for r in dd.connected_components(pairs, stats=stats_local).collect()
    }
    dist = {
        r.id: r.component
        for r in dd.connected_components(
            pairs, small_graph_threshold=0, stats=stats_dist
        ).collect()
    }
    assert stats_local["mode"] == "local-union-find"
    assert stats_dist["mode"] == "distributed"
    assert local == dist


def test_components_local_string_ids(spark):
    """The fast path must handle non-numeric id types (simhash_groups
    runs components over signature values)."""
    pairs = spark.createDataFrame(
        [("sig_b", "sig_c"), ("sig_a", "sig_b"), ("sig_x", "sig_y")],
        "id_a string, id_b string",
    )
    got = {r.id: r.component for r in dd.connected_components(pairs).collect()}
    assert got == {
        "sig_a": "sig_a", "sig_b": "sig_a", "sig_c": "sig_a",
        "sig_x": "sig_x", "sig_y": "sig_x",
    }


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    corpus=st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=0, max_size=15)
        .map(" ".join),
        min_size=2,
        max_size=8,
    ),
    thr=st.sampled_from([(1, 2), (3, 5), (7, 10), (9, 10), (1, 1)]),
)
def test_prefix_filter_pairs_match_bruteforce(spark, corpus, thr):
    """Prefix filtering must reproduce EXHAUSTIVE all-pairs semantics:
    same pairs, same scores, at every threshold including t=1 (where
    the prefix degenerates to a single rarest shingle per doc)."""
    import math

    t_num, t_den = thr
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.prefix_filter_pairs(
            _corpus_df(spark, corpus), t_num=t_num, t_den=t_den,
            persist=False,
        ).collect()
    }
    want = {}
    for a in range(len(corpus)):
        for b in range(a + 1, len(corpus)):
            sa, sb = _shingles(corpus[a]), _shingles(corpus[b])
            if not sa or not sb:
                continue
            inter, union = len(sa & sb), len(sa | sb)
            if t_den * inter >= t_num * union:
                want[(a, b)] = (
                    math.floor(inter / union * 1e6 + 0.5) / 1e6
                )
    assert got == want


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    corpus=st.lists(
        st.lists(st.sampled_from(VOCAB[:3]), min_size=0, max_size=12)
        .map(" ".join),
        min_size=2,
        max_size=6,
    ),
    k=st.sampled_from([1, 2, 3]),
)
def test_duplicate_spans_match_bruteforce(spark, corpus, k):
    """duplicate_spans must equal the brute-force sliding-window count:
    same hashes, same distinct-doc counts, same occurrence totals —
    including single-token spans (k=1) and docs shorter than k."""
    got = {
        r.span_hash: (r.n_docs, r.n_occurrences)
        for r in dd.duplicate_spans(
            _corpus_df(spark, corpus), k=k
        ).collect()
    }
    from collections import defaultdict

    docs, occ = defaultdict(set), defaultdict(int)
    for i, text in enumerate(corpus):
        toks = text.split()
        for s in range(len(toks) - k + 1):
            span = " ".join(toks[s : s + k])
            h = hashlib.md5(span.encode()).hexdigest()
            docs[h].add(i)
            occ[h] += 1
    want = {
        h: (len(ds), occ[h]) for h, ds in docs.items() if len(ds) >= 2
    }
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    corpus=st.lists(
        st.lists(st.sampled_from(VOCAB[:3]), min_size=0, max_size=12)
        .map(" ".join),
        min_size=2,
        max_size=6,
    ),
    k=st.sampled_from([1, 2, 3]),
)
def test_span_coverage_match_bruteforce(spark, corpus, k):
    """Coverage must equal brute-force interval union over flagged
    spans, including overlap collapsing, coverage-0 docs, and docs
    shorter than k."""
    import math
    from collections import defaultdict

    got = {
        r.doc_id: (r.n_tokens, r.n_covered, r.dup_coverage)
        for r in dd.duplicate_span_coverage(
            _corpus_df(spark, corpus), k=k, persist=False
        ).collect()
    }
    span_docs = defaultdict(set)
    for i, text in enumerate(corpus):
        toks = text.split()
        for s in range(len(toks) - k + 1):
            span_docs[" ".join(toks[s : s + k])].add(i)
    flagged = {sp for sp, ds in span_docs.items() if len(ds) >= 2}
    want = {}
    for i, text in enumerate(corpus):
        toks = text.split()
        cov = set()
        for s in range(len(toks) - k + 1):
            if " ".join(toks[s : s + k]) in flagged:
                cov.update(range(s, s + k))
        frac = (
            math.floor(len(cov) / len(toks) * 1e6 + 0.5) / 1e6
            if toks else 0.0
        )
        want[i] = (len(toks), len(cov), frac)
    assert got == want


# ---------------------------------------------------------------------------
# Deterministic edge cases the generators rarely hit (r6 verdict item 6):
# corpus-wide-frequent shingles (prefix = whole document), k-token docs
# (exactly one span), and byte-identical docs at different ids.
# ---------------------------------------------------------------------------


def test_prefix_filter_all_shingles_corpus_frequent(spark):
    """When EVERY shingle appears in every document, the global
    (df, shingle) order gives no rare prefix entries — the prefix
    degenerates toward the whole document, and the filter must still
    reproduce exhaustive all-pairs exactly (here: all docs are
    3-shingle-identical permuted paddings of one shared core)."""
    import math

    core = "alpha beta gamma alpha beta gamma alpha beta gamma"
    corpus = [core, core + " alpha beta gamma", core, core]
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.prefix_filter_pairs(
            _corpus_df(spark, corpus), t_num=1, t_den=2, persist=False
        ).collect()
    }
    want = {}
    for a in range(len(corpus)):
        for b in range(a + 1, len(corpus)):
            sa, sb = _shingles(corpus[a]), _shingles(corpus[b])
            inter, union = len(sa & sb), len(sa | sb)
            if 2 * inter >= union:
                want[(a, b)] = math.floor(inter / union * 1e6 + 0.5) / 1e6
    assert got == want
    # the identical docs must pair at exactly 1.0
    assert got[(0, 2)] == 1.0 and got[(0, 3)] == 1.0 and got[(2, 3)] == 1.0


def test_prefix_filter_byte_identical_docs_all_thresholds(spark):
    """Byte-identical docs at different ids must surface at jaccard
    1.0 for every threshold including t=1 (prefix = single shingle)."""
    corpus = ["alpha beta gamma delta eps"] * 4 + ["zeta zeta zeta"]
    for t_num, t_den in [(1, 1), (9, 10), (1, 2)]:
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in dd.prefix_filter_pairs(
                _corpus_df(spark, corpus), t_num=t_num, t_den=t_den,
                persist=False,
            ).collect()
        }
        assert got == {
            (a, b): 1.0 for a in range(4) for b in range(a + 1, 4)
        }, (t_num, t_den)


def test_duplicate_spans_exactly_k_tokens(spark):
    """A k-token document contributes exactly ONE span; two identical
    k-token docs make that span a flagged duplicate with 2 docs /
    2 occurrences, and their coverage is exactly 1.0."""
    corpus = ["alpha beta gamma", "alpha beta gamma", "delta eps zeta"]
    spans = {
        r.span_hash: (r.n_docs, r.n_occurrences)
        for r in dd.duplicate_spans(
            _corpus_df(spark, corpus), k=3, min_docs=2
        ).collect()
    }
    h = hashlib.md5(b"alpha beta gamma").hexdigest()
    assert spans == {h: (2, 2)}
    cov = {
        r.doc_id: (r.n_tokens, r.n_covered, r.dup_coverage)
        for r in dd.duplicate_span_coverage(
            _corpus_df(spark, corpus), k=3, persist=False
        ).collect()
    }
    assert cov[0] == (3, 3, 1.0)
    assert cov[1] == (3, 3, 1.0)
    assert cov[2] == (3, 0, 0.0)


def test_span_coverage_byte_identical_docs_is_one(spark):
    """Byte-identical documents (any length >= k) must each report
    dup_coverage exactly 1.0 — every position sits under a flagged
    span — while a unique doc reports 0.0."""
    dup = "alpha beta gamma delta eps zeta alpha beta"
    corpus = [dup, dup, "zeta eps delta"]
    cov = {
        r.doc_id: r.dup_coverage
        for r in dd.duplicate_span_coverage(
            _corpus_df(spark, corpus), k=4, persist=False
        ).collect()
    }
    assert cov == {0: 1.0, 1: 1.0, 2: 0.0}


def test_exact_dedup_single_pass_equals_default(spark, sf_smoke):
    """r13: the window form of exact_dedup must return exactly the rows
    of the groupBy+semi form (same min-id survivor per distinct text)."""
    from hypertension_dashboard_pipeline_spark.io import load_table
    from hypertension_dashboard_pipeline_spark.operators import dedup as dd

    docs = load_table(spark, sf_smoke, "documents")
    a = sorted(map(tuple, dd.exact_dedup(docs).collect()))
    b = sorted(map(tuple, dd.exact_dedup(docs, single_pass=True).collect()))
    assert a == b
