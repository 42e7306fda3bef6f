"""Queryable quality-metric datasets.

Round-2 verdict item #10: the recall / equivalence gates that justify
the approximate operators (MinHash-LSH, IVF ANN, bucketed
sessionization, distributed connected components) lived only in pytest,
so the driver's CORRECTNESS file showed bare `no_oracle` rows for those
queries.  Each function here re-runs the gate as a one-row DataFrame so
the measured recall/equality value is recorded per round alongside the
oracle checks.

These are verification queries, not production operators: each bounds
its exact-comparison side (sampled subsets) so the check itself stays
cheap at any corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def q_minhash_recall(sf_dir: str, id_bound: int = 200) -> pd.DataFrame:
    """Recall of the LSH candidate pairs vs exact shingle-set Jaccard
    (>= 0.8) over the bounded doc_id < ``id_bound`` subset.  16 bands x
    4 rows at J=0.8 has per-pair miss probability ~0.1%."""
    import pyarrow.dataset as pads
    import pyarrow.compute as pc

    from .dedup import _shingles, q_minhash_candidates

    tbl = (
        pads.dataset(f"{sf_dir}/documents.parquet")
        .to_table(columns=["doc_id", "text"], filter=pc.field("doc_id") < id_bound)
    )
    subset = [
        (i, set(_shingles(t).tolist()))
        for i, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    ]
    exact = set()
    for x in range(len(subset)):
        a_id, a_set = subset[x]
        for y in range(x + 1, len(subset)):
            b_id, b_set = subset[y]
            union = len(a_set | b_set)
            if union and len(a_set & b_set) / union >= 0.8:
                exact.add((min(a_id, b_id), max(a_id, b_id)))
    lsh = {(r["doc_a"], r["doc_b"]) for r in q_minhash_candidates(sf_dir).take_all()}
    tp = len(exact & lsh)
    return pd.DataFrame(
        {
            "recall": [round(tp / max(1, len(exact)), 6)],
            "n_exact_pairs": [len(exact)],
            "n_lsh_pairs": [len(lsh)],
            "gate": [0.95],
            "passes": [bool(len(exact) and tp / len(exact) >= 0.95)],
        }
    )


def q_ivf_recall(sf_dir: str) -> pd.DataFrame:
    """Recall of the IVF-partitioned ANN path vs exact brute-force
    cosine top-k on the same embeddings, plus exactness of the returned
    cosines on recovered pairs."""
    import tempfile

    from .similarity import q_ann_topk, q_ivf_topk

    exact_rows = q_ann_topk(sf_dir).take_all()
    with tempfile.TemporaryDirectory(prefix="ivf_metric_") as staging:
        ivf_rows = q_ivf_topk(sf_dir, n_probe=5, staging_dir=staging).take_all()
    exact = {(r["query_id"], r["vec_id"]) for r in exact_rows}
    got = {(r["query_id"], r["vec_id"]) for r in ivf_rows}
    exact_scores = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact_rows}
    max_err = 0.0
    for r in ivf_rows:
        key = (r["query_id"], r["vec_id"])
        if key in exact_scores:
            max_err = max(max_err, abs(r["cosine"] - exact_scores[key]))
    tp = len(exact & got)
    return pd.DataFrame(
        {
            "recall": [round(tp / max(1, len(exact)), 6)],
            "n_exact": [len(exact)],
            "n_ivf": [len(got)],
            "max_cosine_err": [max_err],
            "gate": [0.9],
            "passes": [bool(len(exact) and tp / len(exact) >= 0.9 and max_err < 1e-9)],
        }
    )


def q_lsh_recall(sf_dir: str) -> pd.DataFrame:
    """Recall of the zero-shuffle LSH-bucketed ANN path vs exact
    brute-force cosine top-k (same gate shape as q_ivf_recall)."""
    from .similarity import q_ann_topk, q_lsh_topk

    exact_rows = q_ann_topk(sf_dir).take_all()
    lsh_rows = q_lsh_topk(sf_dir).take_all()
    exact = {(r["query_id"], r["vec_id"]) for r in exact_rows}
    got = {(r["query_id"], r["vec_id"]) for r in lsh_rows}
    exact_scores = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact_rows}
    max_err = 0.0
    for r in lsh_rows:
        key = (r["query_id"], r["vec_id"])
        if key in exact_scores:
            max_err = max(max_err, abs(r["cosine"] - exact_scores[key]))
    tp = len(exact & got)
    return pd.DataFrame(
        {
            "recall": [round(tp / max(1, len(exact)), 6)],
            "n_exact": [len(exact)],
            "n_lsh": [len(got)],
            "max_cosine_err": [max_err],
            "gate": [0.9],
            "passes": [bool(len(exact) and tp / len(exact) >= 0.9 and max_err < 1e-9)],
        }
    )


def _dataset_signature(ds, columns: list[str]) -> tuple[int, int]:
    """Order-insensitive (row-hash-sum mod 2^64, row-count) signature of
    a dataset, computed as a streaming map_batches reduce — the driver
    sees one tiny partial per block, never the rows themselves, so
    whole-dataset equality checks stay corpus-scale-safe."""
    import numpy as np
    import polars as pl
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        hs = pl.from_arrow(batch.select(columns)).hash_rows(seed=7).to_numpy()
        return pa.table(
            {
                # split the u64 wrap-sum into two i64-safe halves
                "lo": [int(np.add.reduce(hs & np.uint64(0xFFFFFFFF), dtype=np.uint64))],
                "hi": [int(np.add.reduce(hs >> np.uint64(32), dtype=np.uint64))],
                "n": [len(hs)],
            }
        )

    lo = hi = n = 0
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        lo += row["lo"]
        hi += row["hi"]
        n += row["n"]
    return ((hi << 32) + lo) % (1 << 64), n


def q_sessions_equivalence(sf_dir: str) -> pd.DataFrame:
    """Exact row-set equality of whale-safe bucketed sessionization vs
    the simple per-user-group path on the FULL events table — compared
    via distributed order-insensitive signatures (no driver
    materialization of the session rows)."""
    from .windows import q_events_sessions

    cols = ["user_id", "session_start_us", "n_events", "sum_value"]
    sig_a, n_a = _dataset_signature(q_events_sessions(sf_dir, bucket_us=None), cols)
    sig_b, n_b = _dataset_signature(
        q_events_sessions(sf_dir, bucket_us=6 * 3600 * 1_000_000), cols
    )
    return pd.DataFrame(
        {
            "paths_equal": [bool(sig_a == sig_b and n_a == n_b)],
            "n_sessions_simple": [n_a],
            "n_sessions_bucketed": [n_b],
        }
    )


def q_embedding_eval(sf_dir: str = "") -> pd.DataFrame:
    """P/R of the real-weights string embedder (tiny trained checkpoint
    through the numpy-BERT forward) on the frozen labeled pair set
    (kazu_ray/assets/embed_eval_pairs.csv) at the SapBERT confirmation
    threshold 0.60 (reference strategies.py:457-528).  The positive
    pairs include zero-lexical-overlap synonyms ("aspirin" /
    "acetylsalicylic acid") that only real trained weights can score
    high — any regression in the forward, tokenizer, loader, or
    projection head changes the cosines and fails the gate.  Fixture-
    based by design; sf_dir is unused."""
    import csv
    import os

    from kazu_ray.state.embedder import EMBED_CHECKPOINT, default_embedder

    emb = default_embedder()
    pairs_csv = os.path.join(os.path.dirname(EMBED_CHECKPOINT), "embed_eval_pairs.csv")
    tp = fp = fn = tn = 0
    with open(pairs_csv, newline="") as f:
        for row in csv.DictReader(f):
            pred = emb.similarity(row["string_a"], row["string_b"]) >= 0.60
            truth = row["is_similar"] == "1"
            tp += pred and truth
            fp += pred and not truth
            fn += (not pred) and truth
            tn += (not pred) and (not truth)
    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    return pd.DataFrame(
        {
            "precision": [round(precision, 6)],
            "recall": [round(recall, 6)],
            "n_pairs": [tp + fp + fn + tn],
            "gate": [1.0],
            "passes": [precision == 1.0 and recall == 1.0],
        }
    )


def q_chem_parity(sf_dir: str = "") -> pd.DataFrame:
    """Exact-match fraction of the IUPAC→SMILES engine vs the frozen
    expected table (kazu_ray/assets/chem_expected.csv — canonical
    SMILES for the test vectors + injection corpus, incl. the
    deliberately-unparseable row).  Fixture-based; sf_dir unused."""
    import csv
    import os

    from kazu_ray.functions.iupac import name_to_smiles

    expected_csv = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets",
        "chem_expected.csv",
    )
    n = ok = 0
    with open(expected_csv, newline="") as f:
        for row in csv.DictReader(f):
            got = name_to_smiles(row["name"])
            n += 1
            ok += (got if got is not None else "") == row["smiles"]
    return pd.DataFrame(
        {
            "exact_match_frac": [round(ok / max(1, n), 6)],
            "n_names": [n],
            "gate": [1.0],
            "passes": [ok == n],
        }
    )


def q_retrieval_parity(sf_dir: str) -> pd.DataFrame:
    """BM25 top-k parity: the two-pass distributed scorer vs DuckDB
    running the identical Okapi formula and tokenizer (the same
    ground-truth helper the pytest gate uses)."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from .retrieval import bm25_duckdb, bm25_topk

    queries = ["neural network training data", "the gene expression"]
    k = 10
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in bm25_topk(ds, queries, k=k).take_all()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS"
        f" SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = sorted((q, r, d, s) for q, d, s, r in bm25_duckdb(con, queries, k))
    equal = [g[:3] for g in got] == [e[:3] for e in exp] and bool(
        np.allclose([g[3] for g in got], [e[3] for e in exp], atol=1e-9)
    )
    return pd.DataFrame({"paths_equal": [bool(equal)], "n_results": [len(got)]})


def q_sampling_parity(sf_dir: str) -> pd.DataFrame:
    """Deterministic split / Bernoulli-sample / epoch-mix decisions vs
    DuckDB recomputing the identical salted md5 predicates."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from .sampling import _SCALE, bernoulli_sample, epoch_mix, split_column

    docs = f"{sf_dir}/documents.parquet"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs}')")

    frac = 0.25
    got_b = sorted(
        r["doc_id"]
        for r in bernoulli_sample(
            rd.read_parquet(docs, columns=["doc_id"]), frac
        ).take_all()
    )
    thr = min(int(frac * _SCALE), (1 << 64) - 1)
    exp_b = [
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM documents WHERE "
            f"md5_number_upper('sample-v1:' || CAST(doc_id AS VARCHAR)) < {thr} "
            f"ORDER BY doc_id"
        ).fetchall()
    ]

    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    got_s = {
        r["doc_id"]: r["split"]
        for r in split_column(
            rd.read_parquet(docs, columns=["doc_id"]), weights
        ).take_all()
    }
    names = list(weights)
    cuts = np.cumsum([weights[n] for n in names])
    cuts[-1] = 1.0 + 1e-9
    cases = " ".join(f"WHEN u < {c!r} THEN '{n}'" for n, c in zip(names, cuts))
    exp_s = dict(
        con.execute(
            f"SELECT doc_id, CASE {cases} END FROM ("
            f"  SELECT doc_id,"
            f"         md5_number_upper('split-v1:' || CAST(doc_id AS VARCHAR))"
            f"           / 18446744073709551616.0 AS u FROM documents)"
        ).fetchall()
    )

    mix = {"src0": 2.3, "src1": 0.4, "src2": 1.0}
    got_m = sorted(
        (r["doc_id"], r["epoch"])
        for r in epoch_mix(
            rd.read_parquet(docs, columns=["doc_id", "source"]),
            mix,
            default_weight=0.7,
        ).take_all()
    )
    w_rows = ", ".join(f"('{s}', {w})" for s, w in mix.items())
    exp_m = sorted(
        con.execute(
            f"""
            WITH w(source, wt) AS (VALUES {w_rows}),
            base AS (
              SELECT doc_id, CAST(COALESCE(wt, 0.7) AS DOUBLE) AS wt,
                     md5_number_upper('mix-v1:' || CAST(doc_id AS VARCHAR))
                       / 18446744073709551616.0 AS u
              FROM documents LEFT JOIN w USING (source))
            SELECT doc_id,
                   unnest(range(CAST(floor(wt) AS BIGINT)
                                + CASE WHEN u < wt - floor(wt) THEN 1 ELSE 0 END))
            FROM base
            """
        ).fetchall()
    )

    equal = got_b == exp_b and got_s == exp_s and got_m == exp_m
    return pd.DataFrame(
        {
            "paths_equal": [bool(equal)],
            "n_sampled": [len(got_b)],
            "n_split": [len(got_s)],
            "n_mixed": [len(got_m)],
        }
    )


def q_snapshot_parity(sf_dir: str) -> pd.DataFrame:
    """Snapshot-diff classification vs a DuckDB FULL OUTER JOIN over md5
    fingerprints, on a deterministically derived second snapshot
    (doc_id%7 removed, doc_id%5 rewritten, doc_id%13 re-added under a
    fresh id) so all four statuses are exercised."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from .snapshot import snapshot_diff

    docs = f"{sf_dir}/documents.parquet"
    new_sql = """
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0
                    THEN 'rewritten ' || CAST(doc_id AS VARCHAR)
                    ELSE text END AS text
        FROM documents WHERE doc_id % 7 != 0
        UNION ALL
        SELECT doc_id + 10000000 AS doc_id,
               'brand new ' || CAST(doc_id AS VARCHAR) AS text
        FROM documents WHERE doc_id % 13 = 0
    """

    def derive_new(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out_ids, out_texts = [], []
        for i, t in zip(ids, texts):
            if i % 7 != 0:
                out_ids.append(i)
                out_texts.append(f"rewritten {i}" if i % 5 == 0 else t)
            if i % 13 == 0:
                out_ids.append(i + 10000000)
                out_texts.append(f"brand new {i}")
        return pa.table(
            {"doc_id": pa.array(out_ids, pa.int64()), "text": out_texts}
        )

    old = rd.read_parquet(docs, columns=["doc_id", "text"])
    new = rd.read_parquet(docs, columns=["doc_id", "text"]).map_batches(
        derive_new, batch_format="pyarrow"
    )
    got = {
        r["doc_id"]: (r["status"], r["fp_old"], r["fp_new"])
        for r in snapshot_diff(old, new).take_all()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs}')")
    exp = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            f"""
            SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN md5(o.text) = md5(n.text) THEN 'unchanged'
                        ELSE 'changed' END AS status,
                   CASE WHEN o.doc_id IS NULL THEN NULL ELSE md5(o.text) END,
                   CASE WHEN n.doc_id IS NULL THEN NULL ELSE md5(n.text) END
            FROM documents o FULL OUTER JOIN ({new_sql}) n USING (doc_id)
            """
        ).fetchall()
    }
    equal = got == exp and {s for s, _, _ in got.values()} == {
        "added", "removed", "changed", "unchanged"
    }
    return pd.DataFrame({"paths_equal": [bool(equal)], "n_keys": [len(got)]})


def q_packing_parity(sf_dir: str) -> pd.DataFrame:
    """Sequence-packing plan parity: the distributed global prefix sum
    vs DuckDB's window-function ground truth."""
    import duckdb
    import ray.data as rd

    from .packing import packing_oracle_sql, sequence_pack

    docs = f"{sf_dir}/documents.parquet"
    seq_len = 256
    got = sorted(
        (r["seq_id"], r["doc_id"], r["tok_start"], r["seq_offset"], r["n_toks"])
        for r in sequence_pack(
            rd.read_parquet(docs, columns=["doc_id", "text"]), seq_len=seq_len
        ).take_all()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs}')")
    exp = sorted(con.execute(packing_oracle_sql(seq_len)).fetchall())
    return pd.DataFrame(
        {"paths_equal": [bool(got == exp)], "n_slices": [len(got)]}
    )


def q_pagerank_parity(sf_dir: str) -> pd.DataFrame:
    """PageRank parity: the dataset-native power iteration vs DuckDB
    replaying the identical recurrence, on a cyclic+dangling graph
    derived deterministically from lineitem."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from .graph import pagerank, pagerank_duckdb

    li = f"{sf_dir}/lineitem.parquet"

    # bounded subgraph (l_orderkey % 7 = 0): the gate checks recurrence
    # parity, not scale — the distributed path's equivalence to the
    # driver recurrence is pinned separately in test_graph.py
    def derive(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        keep = ok % 7 == 0
        ok = ok[keep]
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)[keep]
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)[keep]
        src = np.concatenate([ok % 211, pk % 193])
        dst = np.concatenate([pk % 193, sk % 97 + 300])
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    edges = rd.read_parquet(
        li, columns=["l_orderkey", "l_partkey", "l_suppkey"]
    ).map_batches(derive, batch_format="pyarrow")
    got = sorted((r["node"], r["rank"]) for r in pagerank(edges, n_iter=5).take_all())
    exp = pagerank_duckdb(
        duckdb.connect(),
        f"""
        SELECT l_orderkey % 211 AS src, l_partkey % 193 AS dst
        FROM read_parquet('{li}') WHERE l_orderkey % 7 = 0
        UNION ALL
        SELECT l_partkey % 193 AS src, l_suppkey % 97 + 300 AS dst
        FROM read_parquet('{li}') WHERE l_orderkey % 7 = 0
        """,
        n_iter=5,
    )
    equal = [g[0] for g in got] == [e[0] for e in exp] and bool(
        np.allclose([g[1] for g in got], [e[1] for e in exp], atol=1e-9)
    )
    mass_ok = abs(sum(g[1] for g in got) - 1.0) < 1e-9
    return pd.DataFrame(
        {"paths_equal": [bool(equal and mass_ok)], "n_nodes": [len(got)]}
    )


def q_triangle_parity(sf_dir: str) -> pd.DataFrame:
    """Triangle-count parity: the distributed degree-ordered wedge-count
    pipeline (forced past the driver-path threshold) vs DuckDB's
    closed-wedge self-join on the same derived co-occurrence graph —
    integer counts, so equality is exact."""
    import duckdb

    from .graph import cooccur_edges, cooccur_edges_sql, triangle_counts

    got = sorted(
        (r["node"], r["degree"], r["triangles"])
        for r in triangle_counts(
            cooccur_edges(sf_dir), driver_threshold=0
        ).take_all()
    )
    from .graph import triangles_duckdb

    exp = triangles_duckdb(duckdb.connect(), cooccur_edges_sql(sf_dir))
    return pd.DataFrame(
        {
            "paths_equal": [got == exp],
            "n_nodes": [len(got)],
            "n_triangles": [sum(t for _, _, t in got) // 3],
        }
    )


def q_khop_parity(sf_dir: str) -> pd.DataFrame:
    """k-hop reachability parity: the BSP frontier-expansion path
    (forced past the driver-path threshold) vs DuckDB's bounded
    recursive CTE, exact integer equality on (node, min-dist)."""
    import duckdb

    from .graph import khop_distances, khop_duckdb, layered_edges, layered_edges_sql

    seeds = list(range(0, 400, 50))
    got = sorted(
        (r["node"], r["dist"])
        for r in khop_distances(
            layered_edges(sf_dir), seeds=seeds, k=3, driver_threshold=0
        ).take_all()
    )
    exp = khop_duckdb(
        duckdb.connect(),
        layered_edges_sql(sf_dir),
        "SELECT UNNEST(" + str(seeds) + ") AS node",
        k=3,
    )
    return pd.DataFrame(
        {"paths_equal": [got == exp], "n_reached": [len(got)]}
    )


def q_hits_parity(sf_dir: str) -> pd.DataFrame:
    """HITS parity: the fixed-iteration L2 recurrence vs DuckDB
    replaying it over the same layered graph (the PageRank gate's
    derivation).  Path equivalence (dataset-native vs driver) is
    pinned separately in test_graph.py."""
    import duckdb
    import numpy as np

    from .graph import hits, hits_duckdb, layered_edges, layered_edges_sql

    got = sorted(
        (r["node"], r["hub"], r["authority"])
        for r in hits(layered_edges(sf_dir)).take_all()
    )
    exp = hits_duckdb(duckdb.connect(), layered_edges_sql(sf_dir))
    nodes_ok = [g[0] for g in got] == [e[0] for e in exp]
    g = np.array([[x[1], x[2]] for x in got], dtype=np.float64)
    e = np.array([[x[1], x[2]] for x in exp], dtype=np.float64)
    max_err = float(np.abs(g - e).max()) if nodes_ok and len(g) else 1.0
    norm_ok = (
        abs(float((g[:, 0] ** 2).sum()) - 1.0) < 1e-9
        and abs(float((g[:, 1] ** 2).sum()) - 1.0) < 1e-9
    )
    return pd.DataFrame(
        {
            "paths_equal": [bool(nodes_ok and norm_ok and max_err <= 1e-9)],
            "max_err": [max_err],
            "n_nodes": [len(got)],
        }
    )


def q_transe_gate(sf_dir: str) -> pd.DataFrame:
    """TransE trainer gates over the derived relational KG:

    - equivalence: the distributed epoch pass (broadcast params, sparse
      per-batch gradient partials) reproduces the single-process
      reference running the identical schedule to float64 round-off
      (10 epochs on the REAL distributed path);
    - quality: filtered link prediction after full training (the
      reference math the equivalence gate just certified, so the long
      schedule runs in-process) — hits@1 / hits@10 far above the
      1/n_entities random baseline, and final loss well under the
      initial loss."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from .kgembed import (
        build_vocab,
        encode_triples,
        link_prediction_eval,
        relational_triples,
        transe_train,
        transe_train_local,
    )

    triples = relational_triples(sf_dir)
    entities, relations = build_vocab(triples)
    enc = encode_triples(triples, entities, relations).materialize()
    tbl = pa.concat_tables(
        [t for t in ray.get(enc.to_arrow_refs()) if t.num_rows]
    )

    E_d, R_d, loss_d = transe_train(enc, entities, relations, epochs=10)
    E_l, R_l, loss_l = transe_train_local(tbl, entities, relations, epochs=10)
    equiv_err = float(
        max(abs(E_d - E_l).max(), abs(R_d - R_l).max(), abs(np.array(loss_d) - np.array(loss_l)).max())
    )

    E, R, losses = transe_train_local(tbl, entities, relations, epochs=200)
    hits, mrr = link_prediction_eval(rd.from_arrow(tbl), E, R)
    return pd.DataFrame(
        {
            "equiv_max_err": [equiv_err],
            "hits1": [hits[1]],
            "hits10": [hits[10]],
            "mrr": [mrr],
            "loss_ratio": [losses[-1] / losses[0]],
            "n_entities": [len(entities)],
        }
    )


def q_kn_parity(sf_dir: str) -> pd.DataFrame:
    """Kneser-Ney bigram LM parity: the distributed two-pass pipeline
    (vocab exchange, bigram-count exchange, broadcast-model scoring) vs
    DuckDB recomputing the ENTIRE pipeline — exact on the rounded
    per-doc columns."""
    import duckdb

    from .kn_lm import kn_perplexity_oracle_sql, q_kn_perplexity

    got = q_kn_perplexity(sf_dir).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = con.execute(kn_perplexity_oracle_sql()).df()
    equal = len(got) == len(exp) and bool(
        (got["doc_id"].values == exp["doc_id"].values).all()
        and (got["n_tokens"].values == exp["n_tokens"].values).all()
        and (
            got["neg_logprob_per_token"].values
            == exp["neg_logprob_per_token"].values
        ).all()
        and (got["ppl"].values == exp["ppl"].values).all()
    )
    return pd.DataFrame({"paths_equal": [equal], "n_docs": [len(got)]})


def q_profile_parity(sf_dir: str) -> pd.DataFrame:
    """Column-profile parity: one streaming pass's per-column n /
    n_null / min / max exactly equal DuckDB's aggregates, and each
    column's HLL registers replayed in SQL yield the identical
    distinct estimate and nonzero-register count."""
    import duckdb

    import numpy as np

    from .profile import (
        PROFILE_COLUMNS,
        profile_hll_oracle_sql,
        profile_oracle_sql,
        q_profile,
    )
    from .sketches import HLL_M, hll_estimate

    got = q_profile(sf_dir).sort_values("column").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    exp = (
        con.execute(profile_oracle_sql()).df().sort_values("column").reset_index(drop=True)
    )
    equal = bool(
        (got["column"].values == exp["column"].values).all()
        and (got["n"].values == exp["n"].astype("int64").values).all()
        and (got["n_null"].values == exp["n_null"].astype("int64").values).all()
        and (got["min_str"].fillna("~").values == exp["min_str"].fillna("~").values).all()
        and (got["max_str"].fillna("~").values == exp["max_str"].fillna("~").values).all()
    )
    for col in PROFILE_COLUMNS:
        regs_df = con.execute(profile_hll_oracle_sql(col)).df()
        arr = np.zeros(HLL_M, dtype=np.uint8)
        arr[regs_df["register"].to_numpy()] = regs_df["rho"].to_numpy()
        row = got[got["column"] == col].iloc[0]
        equal = equal and (
            round(hll_estimate(arr), 4) == float(row["n_distinct_est"])
            and int((arr > 0).sum()) == int(row["nonzero_registers"])
        )
    return pd.DataFrame({"paths_equal": [equal], "n_columns": [len(got)]})


def q_repetition_trim_parity(sf_dir: str) -> pd.DataFrame:
    """Within-doc repetition-trim parity: the zero-shuffle vectorized
    trim vs DuckDB's LAG replay — exact counts + cleaned-text md5."""
    import duckdb

    from .quality import q_repetition_trim, repetition_trim_oracle_sql

    got = (
        q_repetition_trim(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = (
        con.execute(repetition_trim_oracle_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    equal = len(got) == len(exp)
    for c in ("doc_id", "n_words", "n_trimmed"):
        equal = equal and bool(
            (got[c].astype("int64").values == exp[c].astype("int64").values).all()
        )
    equal = equal and bool(
        (got["trimmed_digest"].values == exp["trimmed_digest"].values).all()
    )
    return pd.DataFrame(
        {"paths_equal": [bool(equal)], "n_trimmed": [int(got["n_trimmed"].sum())]}
    )


def q_standardize_parity(sf_dir: str) -> pd.DataFrame:
    """Embedding z-score parity: distributed moment-partial stats +
    streaming standardize vs DuckDB recomputing means, population
    stds and sample z-scores — exact on the 6dp-rounded values."""
    import duckdb

    import numpy as np

    from .similarity import q_standardize, standardize_oracle_sql

    got = (
        q_standardize(sf_dir)
        .sort_values(["vec_id", "dim"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    exp = (
        con.execute(standardize_oracle_sql())
        .df()
        .sort_values(["vec_id", "dim"])
        .reset_index(drop=True)
    )
    equal = len(got) == len(exp) and bool(
        (got["vec_id"].values == exp["vec_id"].values).all()
        and (got["dim"].values == exp["dim"].values).all()
        and (np.abs(got["zvalue"].values - exp["zvalue"].values) == 0).all()
    )
    return pd.DataFrame({"paths_equal": [equal], "n_rows": [len(got)]})


def q_fo_join_parity(sf_dir: str) -> pd.DataFrame:
    """Full-outer hash-join parity: the partition-wise join (both null
    directions populated — customers with no logged orders AND orders
    whose customer fell out of the filtered left side) vs DuckDB's
    FULL OUTER JOIN — exact frame equality including null placement."""
    import duckdb

    import numpy as np

    from ..relational import full_outer_join_oracle_sql, q_full_outer_join

    got = (
        q_full_outer_join(sf_dir)
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    exp = (
        con.execute(full_outer_join_oracle_sql())
        .df()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    equal = len(got) == len(exp) and bool(
        (got["c_custkey"].values == exp["c_custkey"].values).all()
    )
    for c in ("c_acctbal", "n_orders", "total_price"):
        equal = equal and bool(
            (got[c].isna().values == exp[c].isna().values).all()
        ) and bool(
            np.allclose(got[c].fillna(0.0), exp[c].fillna(0.0))
        )
    n_left_only = int(got["n_orders"].isna().sum())
    n_right_only = int(got["c_acctbal"].isna().sum())
    return pd.DataFrame(
        {
            "paths_equal": [bool(equal and n_left_only > 0 and n_right_only > 0)],
            "n_left_only": [n_left_only],
            "n_right_only": [n_right_only],
        }
    )


def q_group_quantile_gate(sf_dir: str) -> pd.DataFrame:
    """Groupwise quantile-sketch accuracy: every (group, q) estimate
    within 1% of the exact per-group quantile (numpy linear
    interpolation, same convention as the global quantile gate)."""
    import numpy as np
    import pyarrow.parquet as pq_  # noqa: N813

    from .sketches import q_group_quantiles

    got = q_group_quantiles(sf_dir)
    tbl = pq_.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    ).to_pandas()
    max_rel = 0.0
    for (k_, q), grp in got.groupby(["o_orderpriority", "q"]):
        exact = float(
            np.quantile(
                tbl[tbl["o_orderpriority"] == k_]["o_totalprice"].to_numpy(), q
            )
        )
        est = float(grp["value"].iloc[0])
        max_rel = max(max_rel, abs(est - exact) / abs(exact))
    return pd.DataFrame(
        {"max_rel_err": [max_rel], "n_groups": [got["o_orderpriority"].nunique()]}
    )


def q_wsample_parity(sf_dir: str) -> pd.DataFrame:
    """A-ES weighted-sample parity: the distributed per-block partial
    top-n + bounded merge selects the IDENTICAL id set as DuckDB
    replaying the score (same md5-LE64 uniform, same u^(1/w) order)."""
    import duckdb

    from .sampling import q_weighted_sample, weighted_sample_oracle_sql

    n = 500
    got = q_weighted_sample(sf_dir, n=n).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = con.execute(weighted_sample_oracle_sql(n)).df()
    equal = set(got["doc_id"]) == set(exp["doc_id"]) and len(got) == len(exp)
    return pd.DataFrame({"paths_equal": [bool(equal)], "n": [len(got)]})


def q_pq_gate(sf_dir: str) -> pd.DataFrame:
    """Product-quantization ANN contract: recall@k of the PQ-ADC
    shortlist + exact re-rank path against the exact ANN oracle, and
    path equivalence of the distributed encode+search vs a single-
    process numpy reference replaying the identical pipeline."""
    import numpy as np
    import pyarrow.parquet as pq_  # noqa: N813

    from .similarity import (
        PQ_M,
        PQ_SHORTLIST_FACTOR,
        _batch_matrix,
        _pq_sample,
        pq_encode_matrix,
        pq_train_codebooks,
        q_ann_topk,
        q_pq_topk,
    )

    # train codebooks ONCE (on the vec_id-sorted deterministic sample)
    # and share them across the distributed and reference paths — the
    # gate compares search paths, not two independent trainings
    books = pq_train_codebooks(_pq_sample(sf_dir))
    got = q_pq_topk(sf_dir, books=books).to_pandas()
    exact = q_ann_topk(sf_dir).to_pandas()
    recs = []
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        p = set(got[got["query_id"] == qid]["vec_id"])
        recs.append(len(e & p) / len(e))
    recall = float(np.mean(recs))

    # single-process reference: same sample, same codebooks, same ADC
    # shortlist + exact re-rank, pure numpy
    k = 5
    tbl = pq_.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids, mat = _batch_matrix(tbl)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    codes = pq_encode_matrix(mat, books)
    q_sel = ids < 10
    q_ids, q_mat = ids[q_sel], mat[q_sel]
    dsub = mat.shape[1] // PQ_M
    lut = np.einsum("qmd,mcd->qmc", q_mat.reshape(len(q_mat), PQ_M, dsub), books)
    scores = lut[:, np.arange(PQ_M)[None, :], codes].sum(axis=2)
    rows = []
    shortlist_n = PQ_SHORTLIST_FACTOR * k
    for row, qid in enumerate(q_ids):
        s = scores[row].copy()
        s[ids == qid] = -np.inf
        sl = np.argsort(-s, kind="stable")[:shortlist_n]
        cos = mat[sl] @ q_mat[row]
        top = sl[np.lexsort((ids[sl], -cos))][:k]
        for v in top:
            rows.append((int(qid), int(ids[v]), round(float(mat[v] @ q_mat[row]), 4)))
    ref = pd.DataFrame(rows, columns=["query_id", "vec_id", "cosine"])
    g = got.sort_values(["query_id", "cosine", "vec_id"], ascending=[True, False, True]).reset_index(drop=True)
    r = ref.sort_values(["query_id", "cosine", "vec_id"], ascending=[True, False, True]).reset_index(drop=True)
    paths_equal = len(g) == len(r) and bool(
        (g["query_id"].values == r["query_id"].values).all()
        and (g["vec_id"].values == r["vec_id"].values).all()
        and np.allclose(g["cosine"].values, r["cosine"].values, atol=1e-9)
    )
    return pd.DataFrame(
        {"recall": [recall], "paths_equal": [paths_equal], "gate": [0.9]}
    )


def q_hll_group_gate(sf_dir: str) -> pd.DataFrame:
    """Groupwise HLL contract on per-source distinct tokens: per-group
    register rows BIT-EXACT vs DuckDB replaying the sketch, and every
    group's estimate within the p=8 error envelope of the exact
    per-group COUNT(DISTINCT)."""
    import duckdb

    import ray.data as rd

    from .sketches import (
        hll_group_distinct_tokens,
        hll_group_estimates,
        hll_group_oracle_sql,
    )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    reg_rows = (
        hll_group_distinct_tokens(ds)
        .to_pandas()
        .sort_values(["source", "register"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = con.execute(hll_group_oracle_sql()).df()
    registers_equal = len(reg_rows) == len(exp) and bool(
        (reg_rows["source"].values == exp["source"].values).all()
        and (reg_rows["register"].values == exp["register"].astype("int64").values).all()
        and (reg_rows["rho"].values == exp["rho"].astype("int64").values).all()
    )
    est = hll_group_estimates(reg_rows).set_index("source")["estimate"]
    true = (
        con.execute(
            "SELECT source, COUNT(DISTINCT tok) AS n FROM (SELECT source, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok "
            "FROM documents) GROUP BY source"
        )
        .df()
        .set_index("source")["n"]
    )
    rel_err = float(((est - true).abs() / true).max())
    return pd.DataFrame(
        {
            "registers_equal": [registers_equal],
            "max_rel_err": [rel_err],
            "n_groups": [len(true)],
        }
    )


def q_cms_gate(sf_dir: str) -> pd.DataFrame:
    """Count-Min sketch contract on the documents token stream:
    register-level BIT-EXACT parity vs DuckDB replaying the sketch
    (same md5 row salts, same column index, same per-cell sums), the
    structural lower bound (estimate >= true for EVERY vocab token),
    and the point-query exact fraction (ties to the e/W error bound;
    at this vocab/width ratio collisions across all CMS_D rows are
    ~1e-6 probable, so the gate pins >= 0.99)."""
    import duckdb

    import ray.data as rd

    from .sketches import CMS_D, CMS_W, cms_estimate, cms_sketch_tokens, cms_oracle_sql

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    regs = cms_sketch_tokens(ds)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = con.execute(cms_oracle_sql()).df()
    got_cells = {
        int(d) * CMS_W + int(c): int(regs[d, c])
        for d, c in zip(*regs.nonzero())
    }
    registers_equal = got_cells == dict(
        zip(exp["cell"].astype(int), exp["cnt"].astype(int))
    )
    truth = con.execute(
        "SELECT tok, COUNT(*) AS cnt FROM (SELECT unnest(regexp_extract_all("
        "lower(text), '[a-z0-9]+')) AS tok FROM documents) GROUP BY tok"
    ).df()
    ests = np.array([cms_estimate(regs, t) for t in truth["tok"]])
    true = truth["cnt"].to_numpy()
    lower_bound_ok = bool((ests >= true).all())
    exact_frac = float((ests == true).mean())
    return pd.DataFrame(
        {
            "registers_equal": [registers_equal],
            "lower_bound_ok": [lower_bound_ok],
            "exact_frac": [exact_frac],
            "n_vocab": [len(truth)],
        }
    )


def q_chunk_dedup_parity(sf_dir: str) -> pd.DataFrame:
    """Global keep-first chunk-dedup parity: the two-exchange Ray
    pipeline vs DuckDB replaying the full operator (same chunking, same
    winner rule, same md5 digest of each doc's surviving text) — exact
    on every column including the digests."""
    import duckdb

    from .chunk_dedup import chunk_dedup_oracle_sql, q_chunk_dedup

    got = q_chunk_dedup(sf_dir).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = con.execute(chunk_dedup_oracle_sql()).df()
    equal = len(got) == len(exp) and bool(
        (got["doc_id"].values == exp["doc_id"].values).all()
        and (got["n_chunks"].values == exp["n_chunks"].values).all()
        and (got["n_kept"].values == exp["n_kept"].values).all()
        and (got["kept_frac"].values == exp["kept_frac"].values).all()
        and (
            got["kept_digest"].fillna("~").values
            == exp["kept_digest"].fillna("~").values
        ).all()
    )
    return pd.DataFrame({"paths_equal": [equal], "n_docs": [len(got)]})


def q_bloom_gate(sf_dir: str) -> pd.DataFrame:
    """Bloom-filter contract on the documents key space: zero false
    negatives (structural guarantee) and measured false-positive rate
    within 3x the design target."""
    import ray.data as rd

    from .bloom import bloom_filter, build_bloom

    docs = f"{sf_dir}/documents.parquet"
    members = rd.read_parquet(docs, columns=["doc_id"]).filter(
        lambda r: r["doc_id"] % 2 == 0
    )
    bloom = build_bloom(members, fpr=0.01)
    kept = {
        r["doc_id"]
        for r in bloom_filter(
            rd.read_parquet(docs, columns=["doc_id"]), bloom
        ).take_all()
    }
    all_ids = {
        r["doc_id"] for r in rd.read_parquet(docs, columns=["doc_id"]).take_all()
    }
    in_set = {i for i in all_ids if i % 2 == 0}
    fn = len(in_set - kept)
    fp = len(kept - in_set)
    n_out = max(1, len(all_ids) - len(in_set))
    fpr = fp / n_out
    return pd.DataFrame(
        {
            "false_negatives": [fn],
            "fpr_measured": [round(fpr, 6)],
            "fpr_target": [0.01],
            "passes": [bool(fn == 0 and fpr <= 0.03)],
        }
    )


def q_dsir_parity(sf_dir: str) -> pd.DataFrame:
    """DSIR importance resampling (extras/dsir.py; Xie et al. 2023) vs
    DuckDB recomputing the ENTIRE fit+score+select pipeline — md5
    hashed-n-gram bucketing, Laplace-smoothed bucket log-ratios, per-doc
    importance log-weights and deterministic Gumbel-top-k — as one SQL
    query.  paths_equal requires the same selected doc set AND the same
    per-doc score/key values after round(6)."""
    import duckdb

    from .dsir import dsir_oracle_sql, q_dsir_sample

    got = q_dsir_sample(sf_dir).sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = con.execute(dsir_oracle_sql()).fetchdf().sort_values("doc_id")
    exp = exp.reset_index(drop=True)
    equal = (
        len(got) == len(exp)
        and list(got["doc_id"]) == list(exp["doc_id"])
        and (got["score"] - exp["score"]).abs().max() == 0.0
        and (got["key"] - exp["key"]).abs().max() == 0.0
    )
    return pd.DataFrame({"paths_equal": [bool(equal)], "rows": [len(got)]})


def q_hll_gate(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog distinct-token sketch (extras/sketches.py; Flajolet
    et al. 2007) vs DuckDB: (a) the merged REGISTER ARRAY must be
    bit-exact against SQL replaying the sketch (same md5, same
    register/rank split), and (b) the estimate's relative error vs the
    exact COUNT(DISTINCT) must sit inside the sketch's published error
    envelope (3 sigma ~ 4.9% at p=12)."""
    import duckdb
    import numpy as np

    from .sketches import HLL_M, hll_distinct_tokens, hll_estimate, hll_oracle_sql

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    regs = hll_distinct_tokens(ds)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = np.zeros(HLL_M, dtype=np.uint8)
    for register, rho in con.execute(hll_oracle_sql()).fetchall():
        exp[int(register)] = int(rho)
    registers_equal = bool((regs == exp).all())
    exact = con.execute(
        "SELECT count(DISTINCT tok) FROM (SELECT unnest("
        "regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM documents)"
    ).fetchone()[0]
    est = hll_estimate(regs)
    rel_err = abs(est - float(exact)) / float(exact)
    return pd.DataFrame(
        {
            "registers_equal": [registers_equal],
            "rel_err": [round(rel_err, 6)],
            "estimate": [round(est, 2)],
            "exact": [int(exact)],
            "gate": [0.049],
            "passes": [registers_equal and rel_err <= 0.049],
        }
    )


def q_pmi_parity(sf_dir: str) -> pd.DataFrame:
    """PMI collocation mining (extras/collocations.py; Church & Hanks
    1990) vs DuckDB recomputing the full thresholded bigram-PMI table —
    same tokenizer, same counts, same ln ratio after round(6).  The
    comparison is the FULL set (every bigram with n12 >= MIN_COUNT and
    all five count/score columns), not a top-k whose cutoff could flip
    on float ulps."""
    import duckdb

    from .collocations import pmi_oracle_sql, q_pmi_collocations

    got = q_pmi_collocations(sf_dir).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = con.execute(pmi_oracle_sql()).fetchdf().reset_index(drop=True)
    for c in ("n12", "n1", "n2"):
        exp[c] = exp[c].astype("int64")
    return pd.DataFrame(
        {"paths_equal": [bool(got.equals(exp))], "rows": [len(got)]}
    )


def q_pca_gate(sf_dir: str) -> pd.DataFrame:
    """Distributed PCA (extras/pca.py): (a) the distributed covariance
    matrix vs DuckDB computing every Cov[i, j] from the same parquet
    (<= 1e-9 — exact equality is impossible across engines: float64
    summation order differs), and (b) the distributed-fit projection vs
    a driver-side numpy PCA on the materialized matrix (<= 1e-6
    elementwise after the shared deterministic sign convention)."""
    import duckdb
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data as rd

    from .pca import cov_oracle_sql, covariance_matrix, fit_pca, q_pca_project

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label", "embedding"]
    )
    cov = covariance_matrix(ds)
    d = cov.shape[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    exp = np.zeros((d, d))
    for i, j, c in con.execute(cov_oracle_sql(d)).fetchall():
        exp[int(i), int(j)] = c
        exp[int(j), int(i)] = c
    cov_err = float(np.abs(cov - exp).max())

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    x = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    evals, evecs = np.linalg.eigh(np.cov(x, rowvar=False))
    order = np.argsort(evals)[::-1][:8]
    comps = evecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    proj = (x - x.mean(axis=0)) @ comps.T
    vid = t.column("vec_id").to_numpy()
    proj = np.round(proj[np.argsort(vid)], 6)
    got = np.asarray(q_pca_project(sf_dir)["pca"].to_list())
    path_err = float(np.abs(got - proj).max())
    return pd.DataFrame(
        {
            "cov_max_abs_err": [cov_err],
            "path_max_abs_err": [path_err],
            "passes": [cov_err <= 1e-9 and path_err <= 1e-6],
        }
    )


def q_bpe_gate(sf_dir: str) -> pd.DataFrame:
    """Distributed BPE training (extras/bpe.py; Sennrich et al. 2016):
    (a) the merge list learned from the DISTRIBUTED word-count fit must
    equal the merge list learned by a plain single-process recount of
    the same parquet (the kmeans-style equivalence gate), and (b) the
    distributed apply's per-doc token counts must equal the reference
    encoder's count on EVERY document."""
    import numpy as np
    import ray.data as rd

    from .bpe import (
        bpe_token_counts,
        encode_word,
        fit_bpe,
        learn_merges,
        reference_word_counts,
    )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    merges = fit_bpe(ds)
    ref_merges = learn_merges(reference_word_counts(f"{sf_dir}/documents.parquet"))
    fit_equal = merges == ref_merges

    got = {
        int(r["doc_id"]): int(r["n_bpe_tokens"])
        for r in bpe_token_counts(ds, merges).take_all()
    }
    import re

    import pyarrow.parquet as pq

    ranks = {p: i for i, p in enumerate(ref_merges)}
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    memo: dict = {}
    ok = 0
    n = t.num_rows
    for doc_id, txt in zip(t.column("doc_id"), t.column("text")):
        s = txt.as_py() or ""
        total = 0
        for w in re.findall(r"[a-z0-9]+", s.lower()):
            c = memo.get(w)
            if c is None:
                c = memo[w] = len(encode_word(w, ranks))
            total += c
        if got.get(int(doc_id.as_py())) == total:
            ok += 1
    apply_frac = ok / n if n else 1.0
    return pd.DataFrame(
        {
            "fit_equal": [bool(fit_equal)],
            "apply_equal_frac": [float(apply_frac)],
            "n_merges": [len(merges)],
            "passes": [bool(fit_equal and apply_frac == 1.0)],
        }
    )


def q_unigram_gate(sf_dir: str) -> pd.DataFrame:
    """Unigram-LM tokenizer training (extras/unigram.py; Kudo 2018),
    gated the same two ways as BPE: (a) the piece/log-prob vocabulary
    learned from the DISTRIBUTED word-count fit must EQUAL the
    vocabulary a single-process recount of the same parquet trains
    (the trainer is a pure deterministic function of the word table),
    and (b) the distributed Viterbi apply's per-doc token counts must
    equal the reference encoder's count on EVERY document."""
    import re

    import pyarrow.parquet as pq
    import ray.data as rd

    from .bpe import reference_word_counts
    from .unigram import fit_unigram, train_unigram, unigram_token_counts, viterbi

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    logp = fit_unigram(ds)
    ref_logp = train_unigram(reference_word_counts(f"{sf_dir}/documents.parquet"))
    fit_equal = set(logp) == set(ref_logp) and all(
        abs(logp[p] - ref_logp[p]) < 1e-12 for p in logp
    )

    got = {
        int(r["doc_id"]): int(r["n_unigram_tokens"])
        for r in unigram_token_counts(ds, logp).take_all()
    }
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    memo: dict = {}
    ok = 0
    n = t.num_rows
    for doc_id, txt in zip(t.column("doc_id"), t.column("text")):
        s = txt.as_py() or ""
        total = 0
        for w in re.findall(r"[a-z0-9]+", s.lower()):
            c = memo.get(w)
            if c is None:
                c = memo[w] = len(viterbi(w, ref_logp))
            total += c
        if got.get(int(doc_id.as_py())) == total:
            ok += 1
    apply_frac = ok / n if n else 1.0
    return pd.DataFrame(
        {
            "fit_equal": [bool(fit_equal)],
            "apply_equal_frac": [float(apply_frac)],
            "vocab_size": [len(logp)],
            "passes": [bool(fit_equal and apply_frac == 1.0)],
        }
    )


def q_punkt_gate(sf_dir: str) -> pd.DataFrame:
    """Boundary-exactness of the unsupervised Punkt sentencizer
    (stages/punkt.py; Kiss & Strunk 2006): train on the deterministic
    prose corpus (sources/prose.py — known true sentence spans by
    construction), segment it, and score span-exact P/R/F1 plus recall
    of the seeded scholarly abbreviation inventory.  The statistical
    analogue of the reference's genia-Stanza segmenter, gated the same
    way the tiny-BERT NER path is (a learned model whose output is
    scored against ground truth the model never saw as labels)."""
    import ray.data as rd

    from ..sources.prose import prose_doc, prose_table
    from ..stages.punkt import sentence_spans_punkt, train_punkt

    n_docs = 300
    params = train_punkt(rd.from_arrow(prose_table(n_docs)))
    tp = fp = fn = 0
    for i in range(n_docs):
        text, true_spans = prose_doc(i)
        pred = set(sentence_spans_punkt(text, params))
        ts = set(true_spans)
        tp += len(ts & pred)
        fp += len(pred - ts)
        fn += len(ts - pred)
    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    f1 = 2 * precision * recall / max(1e-12, precision + recall)
    seeded = ["approx", "vs", "e.g", "i.e", "fig", "no", "ca", "dr", "al", "spp"]
    abbrev_recall = sum(a in params.abbrev_types for a in seeded) / len(seeded)
    return pd.DataFrame(
        {
            "f1": [round(f1, 6)],
            "abbrev_recall": [round(abbrev_recall, 6)],
            "gate": [0.99],
            "passes": [bool(f1 >= 0.99 and abbrev_recall == 1.0)],
        }
    )


# q_approx_metrics is memoized per sf_dir so q_gates_failing (the
# oracle-pinned zero-rows view of the same gates, see below) costs
# nothing extra when the driver runs both in one process.  The cache
# holds one small DataFrame per sf_dir; callers get copies.
_APPROX_CACHE: dict[str, pd.DataFrame] = {}


def q_approx_metrics(sf_dir: str) -> pd.DataFrame:
    """One row per quality gate — recall / equivalence / parity metrics
    behind the approximate and non-SQL-expressible operators, folded
    into a single query so every gate lands in the driver's CORRECTNESS
    file each round (the driver records the first 50 queries; one
    consolidated metrics query keeps the full oracle-checked surface
    inside that budget)."""
    cached = _APPROX_CACHE.get(sf_dir)
    if cached is not None:
        return cached.copy()
    rows: list[tuple[str, float, float, bool]] = []

    def add(metric: str, value, gate, passes):
        rows.append((metric, float(value), float(gate), bool(passes)))

    m = q_minhash_recall(sf_dir).iloc[0]
    add("minhash_recall", m["recall"], m["gate"], m["passes"])
    m = q_ivf_recall(sf_dir).iloc[0]
    add("ivf_recall", m["recall"], m["gate"], m["passes"])
    add("ivf_max_cosine_err", m["max_cosine_err"], 1e-9, m["max_cosine_err"] < 1e-9)
    m = q_lsh_recall(sf_dir).iloc[0]
    add("lsh_recall", m["recall"], m["gate"], m["passes"])
    m = q_sessions_equivalence(sf_dir).iloc[0]
    add("sessions_equivalence", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"])
    m = q_neardup_cc_equivalence(sf_dir).iloc[0]
    add("neardup_cc_equivalence", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"])
    from .sketches import q_quantile_accuracy

    m = q_quantile_accuracy(sf_dir).iloc[0]
    add("quantile_max_rel_err", m["max_rel_err"], m["gate"], m["passes"])
    m = q_embedding_eval(sf_dir).iloc[0]
    add("embedding_eval_precision", m["precision"], m["gate"], m["passes"])
    add("embedding_eval_recall", m["recall"], m["gate"], m["passes"])
    m = q_chem_parity(sf_dir).iloc[0]
    add("chem_exact_match_frac", m["exact_match_frac"], m["gate"], m["passes"])
    m = q_retrieval_parity(sf_dir).iloc[0]
    add("bm25_parity", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"])
    m = q_sampling_parity(sf_dir).iloc[0]
    add("sampling_parity", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"])
    m = q_snapshot_parity(sf_dir).iloc[0]
    add("snapshot_parity", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"])
    m = q_bloom_gate(sf_dir).iloc[0]
    add("bloom_fpr", m["fpr_measured"], 0.03, m["passes"])
    m = q_packing_parity(sf_dir).iloc[0]
    add("packing_parity", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"])
    m = q_pagerank_parity(sf_dir).iloc[0]
    add("pagerank_parity", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"])
    m = q_triangle_parity(sf_dir).iloc[0]
    add("triangles_parity", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"])
    m = q_khop_parity(sf_dir).iloc[0]
    add("khop_parity", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"])
    m = q_hits_parity(sf_dir).iloc[0]
    add("hits_parity", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"])
    m = q_transe_gate(sf_dir).iloc[0]
    add("transe_equiv_max_err", m["equiv_max_err"], 1e-9, m["equiv_max_err"] <= 1e-9)
    add("transe_hits1", m["hits1"], 0.8, m["hits1"] >= 0.8)
    add("transe_hits10", m["hits10"], 0.95, m["hits10"] >= 0.95)
    add("transe_loss_ratio", m["loss_ratio"], 0.2, m["loss_ratio"] <= 0.2)
    m = q_kn_parity(sf_dir).iloc[0]
    add("kn_parity", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"])
    m = q_chunk_dedup_parity(sf_dir).iloc[0]
    add("chunk_dedup_parity", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"])
    m = q_cms_gate(sf_dir).iloc[0]
    add(
        "cms_register_parity",
        1.0 if m["registers_equal"] else 0.0,
        1.0,
        m["registers_equal"],
    )
    add(
        "cms_point_exact_frac",
        m["exact_frac"],
        0.99,
        bool(m["lower_bound_ok"]) and m["exact_frac"] >= 0.99,
    )
    m = q_hll_group_gate(sf_dir).iloc[0]
    add(
        "hll_group_register_parity",
        1.0 if m["registers_equal"] else 0.0,
        1.0,
        m["registers_equal"],
    )
    add("hll_group_max_rel_err", m["max_rel_err"], 0.15, m["max_rel_err"] <= 0.15)
    m = q_pq_gate(sf_dir).iloc[0]
    add("pq_recall", m["recall"], m["gate"], m["recall"] >= m["gate"])
    add("pq_path_equal", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"])
    m = q_wsample_parity(sf_dir).iloc[0]
    add("wsample_parity", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"])
    m = q_group_quantile_gate(sf_dir).iloc[0]
    add(
        "group_quantile_max_rel_err",
        m["max_rel_err"],
        0.01,
        m["max_rel_err"] <= 0.01,
    )
    m = q_fo_join_parity(sf_dir).iloc[0]
    add("fo_join_parity", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"])
    m = q_standardize_parity(sf_dir).iloc[0]
    add(
        "standardize_parity", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"]
    )
    m = q_repetition_trim_parity(sf_dir).iloc[0]
    add(
        "repetition_trim_parity",
        1.0 if m["paths_equal"] else 0.0,
        1.0,
        m["paths_equal"],
    )
    m = q_profile_parity(sf_dir).iloc[0]
    add("profile_parity", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"])
    from .kmeans import q_kmeans_equivalence

    from ..stages.distill import q_distill_gate

    m = q_distill_gate(sf_dir).iloc[0]
    add(
        "distill_path_equal",
        1.0 if m["path_max_err"] == 0.0 else 0.0,
        1.0,
        m["path_max_err"] == 0.0,
    )
    add("distill_agreement", m["agreement"], 0.999, m["agreement"] >= 0.999)
    # student >= teacher - eps on the golden docs (the teacher's own
    # transformer_eval gate pins P = R = 1.0; eps = 0.02)
    add(
        "distill_student_precision",
        m["student_precision"],
        0.98,
        m["student_precision"] >= 0.98,
    )
    add(
        "distill_student_recall",
        m["student_recall"],
        0.98,
        m["student_recall"] >= 0.98,
    )
    m = q_punkt_gate(sf_dir).iloc[0]
    add("punkt_boundary_f1", m["f1"], m["gate"], m["passes"])
    m = q_dsir_parity(sf_dir).iloc[0]
    add("dsir_parity", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"])
    m = q_hll_gate(sf_dir).iloc[0]
    add("hll_register_parity", 1.0 if m["registers_equal"] else 0.0, 1.0, m["registers_equal"])
    add("hll_rel_err", m["rel_err"], m["gate"], m["rel_err"] <= m["gate"])
    m = q_pmi_parity(sf_dir).iloc[0]
    add("pmi_parity", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"])
    m = q_pca_gate(sf_dir).iloc[0]
    add("pca_cov_max_err", m["cov_max_abs_err"], 1e-9, m["cov_max_abs_err"] <= 1e-9)
    add("pca_path_max_err", m["path_max_abs_err"], 1e-6, m["path_max_abs_err"] <= 1e-6)
    m = q_bpe_gate(sf_dir).iloc[0]
    add("bpe_fit_equal", 1.0 if m["fit_equal"] else 0.0, 1.0, m["fit_equal"])
    add("bpe_apply_equal_frac", m["apply_equal_frac"], 1.0, m["apply_equal_frac"] == 1.0)
    m = q_unigram_gate(sf_dir).iloc[0]
    add("unigram_fit_equal", 1.0 if m["fit_equal"] else 0.0, 1.0, m["fit_equal"])
    add(
        "unigram_apply_equal_frac",
        m["apply_equal_frac"],
        1.0,
        m["apply_equal_frac"] == 1.0,
    )
    from .lrfilter import q_lr_gate

    m = q_lr_gate(sf_dir).iloc[0]
    add("lr_fit_max_werr", m["max_werr"], 1e-6, m["max_werr"] <= 1e-6)
    add("lr_agreement", m["agreement"], 0.999, m["agreement"] >= 0.999)
    add("lr_train_accuracy", m["accuracy"], 0.9, m["accuracy"] >= 0.9)
    m = q_kmeans_equivalence(sf_dir).iloc[0]
    add("kmeans_assign_equal_frac", m["assign_equal_frac"], 1.0, m["passes"])
    add("kmeans_centroid_max_err", m["centroid_max_err"], 1e-9, m["centroid_max_err"] < 1e-9)
    add(
        "semdedup_invariants",
        1.0 if (m["semdedup_kept_ok"] and m["semdedup_dropped_ok"]) else 0.0,
        1.0,
        m["semdedup_kept_ok"] and m["semdedup_dropped_ok"],
    )
    from .multimodal import (
        AVI_MEAN_ABS_ERR,
        JPEG_MEAN_ABS_ERR,
        q_media_decode_gate,
    )

    m = q_media_decode_gate(sf_dir).iloc[0]
    # gate "passes" additionally requires all 6 container formats
    # observed, jpeg max-abs in envelope, and AVI frame-count parity
    add(
        "media_lossless_exact_frac",
        m["lossless_exact_frac"],
        1.0,
        m["passes"] and m["lossless_exact_frac"] == 1.0,
    )
    add(
        "media_jpeg_mean_abs_err",
        m["jpeg_mean_abs_err"],
        JPEG_MEAN_ABS_ERR,
        m["passes"] and m["jpeg_mean_abs_err"] <= JPEG_MEAN_ABS_ERR,
    )
    add(
        "media_video_mean_abs_err",
        m["video_max_mean_err"],
        AVI_MEAN_ABS_ERR,
        m["passes"] and m["video_max_mean_err"] <= AVI_MEAN_ABS_ERR,
    )
    from .compress import q_compression_gate

    m = q_compression_gate(sf_dir).iloc[0]
    add(
        "compression_parity",
        1.0 if m["paths_equal"] else 0.0,
        1.0,
        m["paths_equal"],
    )
    m = q_cdc_parity(sf_dir).iloc[0]
    add("cdc_parity", 1.0 if m["paths_equal"] else 0.0, 1.0, m["paths_equal"])
    m = q_textfix_gate(sf_dir).iloc[0]
    add("textfix_recovery", m["recovered_frac"], 1.0, m["passes"])
    # trained NB classifier learns real signal: train accuracy must
    # beat 3x the 20-class majority baseline (exactness itself is the
    # nb_classifier DuckDB oracle)
    from .nb_text import q_nb_classifier

    acc = float(q_nb_classifier(sf_dir).to_pandas()["correct"].mean())
    add("nb_train_accuracy", acc, 0.15, acc >= 0.15)
    from .imagehash import q_imagehash_gate

    m = q_imagehash_gate(sf_dir).iloc[0]
    add(
        "imagehash_path_equal",
        1.0 if m["paths_equal"] else 0.0,
        1.0,
        m["paths_equal"],
    )
    add(
        "imagehash_pairs_exact",
        1.0 if m["pairs_equal"] else 0.0,
        1.0,
        m["pairs_equal"],
    )
    add(
        "imagehash_planted_recall",
        m["planted_recall"],
        1.0,
        m["planted_recall"] == 1.0,
    )
    out = pd.DataFrame(rows, columns=["metric", "value", "gate", "passes"])
    _APPROX_CACHE[sf_dir] = out
    return out.copy()


def q_cdc_parity(sf_dir: str) -> pd.DataFrame:
    """Content-defined-chunking dedup parity: the distributed hash-only
    exchange pipeline vs the single-process reference replay (same
    chunker, same keep-first rule, same survivor digests) — exact on
    every column.  No SQL oracle is possible (the rolling hash is not
    expressible in DuckDB), so this is a reference-replay gate like
    pq_path_equal."""
    import pyarrow.parquet as pq

    from .cdc import cdc_reference, q_cdc_dedup

    got = q_cdc_dedup(sf_dir).to_pandas().reset_index(drop=True)
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    exp = cdc_reference(docs).sort_values("doc_id").reset_index(drop=True)
    equal = len(got) == len(exp) and bool(
        (got["doc_id"].values == exp["doc_id"].values).all()
        and (got["n_chunks"].values == exp["n_chunks"].values).all()
        and (got["n_kept"].values == exp["n_kept"].values).all()
        and (got["kept_frac"].values == exp["kept_frac"].values).all()
        and (
            got["kept_digest"].fillna("~").values
            == exp["kept_digest"].fillna("~").values
        ).all()
    )
    return pd.DataFrame({"paths_equal": [equal], "n_docs": [len(got)]})


def q_textfix_gate(sf_dir: str) -> pd.DataFrame:
    """Mojibake-repair ground-truth gate: every doc in the planted-
    corruption corpus must recover its known original bit-exactly
    (incl. the double-encoded ones), the repair must be idempotent,
    and at least one single- and one double-corrupted doc must have
    been exercised."""
    from .textfix import q_textfix

    df = q_textfix(sf_dir).to_pandas()
    recovered_frac = float(df["recovered"].mean())
    exercised = (
        (df["rounds_injected"] == 1).any()
        and (df["rounds_injected"] == 2).any()
        and (df["rounds_fixed"] == df["rounds_injected"]).all()
    )
    return pd.DataFrame(
        {
            "recovered_frac": [recovered_frac],
            "n_docs": [len(df)],
            "passes": [recovered_frac == 1.0 and bool(exercised)],
        }
    )


def q_gates_failing(sf_dir: str) -> pd.DataFrame:
    """The FAILING rows of q_approx_metrics — pinned to ZERO rows by an
    explicit SQL oracle (``gates_failing_oracle_sql``), so a broken gate
    flips the driver's rows_match in CORRECTNESS_r{N}, not just pytest
    (round-4 verdict item #4: approx_metrics itself is rows-only
    recorded, so a gate flipping pass→fail never changed the driver
    file).  Shares q_approx_metrics' memo, so it is free when both run
    in one driver process."""
    df = q_approx_metrics(sf_dir)
    out = df[~df["passes"]].reset_index(drop=True)
    return out.astype(
        {"metric": object, "value": "float64", "gate": "float64", "passes": "bool"}
    )


def gates_failing_oracle_sql() -> str:
    """Zero rows, same (metric, value, gate, passes) schema: every
    quality gate is expected to pass every round."""
    return """
        SELECT CAST(NULL AS VARCHAR) AS metric,
               CAST(NULL AS DOUBLE) AS value,
               CAST(NULL AS DOUBLE) AS gate,
               CAST(NULL AS BOOLEAN) AS passes
        WHERE FALSE
    """


def q_neardup_cc_equivalence(sf_dir: str) -> pd.DataFrame:
    """Component-partition equality of the dataset-native label-prop
    connected-components path vs the bounded driver union-find path on
    the same LSH candidate pairs (same partition of doc ids, label
    values normalized to each component's min member)."""
    from .cluster import connected_components
    from .dedup import q_minhash_candidates

    pairs = q_minhash_candidates(sf_dir).materialize()
    driver = {
        r["doc_id"]: r["component"] for r in connected_components(pairs).take_all()
    }
    distributed = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs, driver_threshold=0).take_all()
    }

    def canon(labels: dict) -> set:
        groups: dict = {}
        for doc, comp in labels.items():
            groups.setdefault(comp, []).append(doc)
        return {tuple(sorted(v)) for v in groups.values()}

    equal = canon(driver) == canon(distributed)
    return pd.DataFrame(
        {
            "paths_equal": [bool(equal)],
            "n_docs": [len(driver)],
            "n_components_driver": [len(set(driver.values()))],
            "n_components_distributed": [len(set(distributed.values()))],
        }
    )
