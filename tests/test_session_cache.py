"""Session memo-cache lifecycle guards (ADVICE r08): entries must be
scoped to a live session, evicted once their session stops, and fully
forgettable on demand (the bench cold-run discipline)."""

from __future__ import annotations

from dbsuite_spark import tables as T


class _FakeContext:
    def __init__(self, alive: bool = True):
        self._jsc = object() if alive else None


class _FakeSession:
    """Just enough surface for the memo helpers: identity + a
    SparkContext whose ``_jsc`` goes None on stop (the documented
    stopped-state probe)."""

    def __init__(self):
        self.sparkContext = _FakeContext(alive=True)

    def stop(self):
        self.sparkContext._jsc = None


def test_memo_frame_builds_once_per_session():
    s = _FakeSession()
    calls = []
    out1 = T.memo_frame(s, "k", lambda: calls.append(1) or "frame")
    out2 = T.memo_frame(s, "k", lambda: calls.append(2) or "other")
    assert out1 == out2 == "frame"
    assert calls == [1], "second lookup must hit the cache"
    T.clear_session_cache(s)


def test_stopped_session_entries_evicted_on_next_access():
    dead = _FakeSession()
    T.memo_frame(dead, "k1", lambda: "dead-frame")
    assert (id(dead), "k1") in T._SESSION_CACHE
    dead.stop()
    # any later memo access purges the stopped session's entries
    live = _FakeSession()
    T.memo_frame(live, "k2", lambda: "live-frame")
    assert (id(dead), "k1") not in T._SESSION_CACHE
    assert id(dead) not in T._MEMO_SESSIONS
    assert (id(live), "k2") in T._SESSION_CACHE
    T.clear_session_cache(live)


def test_clear_session_cache_scopes_to_one_session():
    a, b = _FakeSession(), _FakeSession()
    T.memo_frame(a, "k", lambda: "a-frame")
    T.memo_frame(b, "k", lambda: "b-frame")
    T.clear_session_cache(a)
    assert (id(a), "k") not in T._SESSION_CACHE
    assert T.memo_frame(b, "k", lambda: "rebuilt") == "b-frame", (
        "clearing session a must not evict session b"
    )
    T.clear_session_cache(b)


def test_clear_session_cache_all_sessions():
    a, b = _FakeSession(), _FakeSession()
    T.memo_frame(a, "k", lambda: "a")
    T.memo_frame(b, "k", lambda: "b")
    T.clear_session_cache()
    assert not [k for k in T._SESSION_CACHE if k[0] in (id(a), id(b))]
    assert not [s for s in T._MEMO_SESSIONS if s in (id(a), id(b))]


def test_memo_cache_unpersists_dataframes_on_clear(spark, sf_dir):
    """The real-DataFrame path: clear_session_cache must unpersist the
    cached frame (bench cold runs rely on this releasing storage), and
    a later call must rebuild instead of returning the evicted one."""
    from dbsuite_spark.tables import t

    df = t(spark, sf_dir, "nation").select("n_nationkey")
    out = T.memo_cache(df, "test_nation_proj")
    assert out.storageLevel.useMemory
    again = T.memo_cache(df, "test_nation_proj")
    assert again is out
    T.clear_session_cache(spark)
    assert not out.storageLevel.useMemory, "clear must unpersist"
    # a later call re-enters the build path and re-caches (cache()
    # returns its receiver, so object identity can't distinguish —
    # the storage level flipping back on is the rebuild proof)
    rebuilt = T.memo_cache(df, "test_nation_proj")
    assert rebuilt.storageLevel.useMemory
    T.clear_session_cache(spark)


def test_bpe_oracles_share_trainer_stages():
    """ADVICE r08: both BPE oracles must assemble from the SAME stage
    list — every trainer CTE (words, w0, p{r}/b{r}/w{r}) appears
    verbatim in the encode oracle's WITH body, so a formatting change
    cannot desynchronize them the way the old string-slicing did."""
    from dbsuite_spark.pipeline.vocab import (
        BPE_MERGES,
        _bpe_encode_oracle,
        _bpe_oracle,
        _bpe_trainer_stages,
    )

    stages = _bpe_trainer_stages()
    assert len(stages) == 1 + BPE_MERGES
    train, encode = _bpe_oracle(), _bpe_encode_oracle()
    for stage in stages:
        assert stage in train, stage[:40]
        assert stage in encode, stage[:40]
    # the encode oracle reuses the learned rules, not a re-training
    assert f"b{BPE_MERGES}" in encode and f"a{BPE_MERGES}" in encode


def test_clear_session_cache_clears_interior_caches(spark, sf_dir):
    """Round-13 measurement-bug fix (guide §1): frames ``.cache()``d
    INSIDE a memoized substrate build (never registered in the memo) must
    also go cold on clear — previously they survived in the CacheManager
    and an equal rebuilt plan silently rehydrated them, so bench "cold"
    runs after the first were warm on those stages."""
    from dbsuite_spark.tables import t

    interior = t(spark, sf_dir, "nation").select("n_nationkey").cache()
    interior.count()  # materialize
    assert interior.storageLevel.useMemory
    T.clear_session_cache(spark)
    assert not interior.storageLevel.useMemory, (
        "interior cache must be cleared, or bench cold runs stay warm"
    )
    # an equal plan rebuilt after the clear must NOT come back cached
    rebuilt = t(spark, sf_dir, "nation").select("n_nationkey")
    assert not rebuilt.storageLevel.useMemory
