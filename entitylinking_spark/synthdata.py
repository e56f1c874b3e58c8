"""Deterministic synthetic `repo_files` generator with planted clusters.

Implements FIXTURES.md §1-3: seeded (default 42), no external data. Ground
truth (cluster membership) is known at generation time, which gives us the
labeled pairwise decisions the pairwise-F1 target is measured against
(BASELINE.md). Mirrors the reference's only synthetic fixture idea — the
fake 8-entity database at /root/reference/Sparkle/database.py:82-131 —
scaled up and made cluster-structured.

Cluster structure: 60% of rows singletons, 30% in pairs, 8% in clusters of
3-10, 2% in clusters of 11-50. Members of clusters >= 3 are mutated in a
CHAIN (each derived from the previous), so distant members fall below the
pair threshold and only transitive clustering can co-cluster them.
A shared license header on ~15% of clusters forces LSH mega-blocks (skew).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

LANGS = ["python", "java", "js", "go", "c", "rust"]
LANG_P = [0.40, 0.20, 0.15, 0.10, 0.10, 0.05]
EXT = {"python": "py", "java": "java", "js": "js", "go": "go", "c": "c", "rust": "rs"}

_HEADER = (
    "license apache version 2.0 copyright contributors permission granted "
    "free of charge to any person obtaining a copy of this software and "
    "associated documentation files to deal in the software without restriction"
).split()


def _vocab(rng: np.random.RandomState, n: int = 600) -> list[str]:
    kw = ("def class return import if else for while try except fn func var let "
          "const static void int str map list vec push append self this new").split()
    syll = ["get", "set", "load", "parse", "node", "tree", "hash", "key", "val",
            "buf", "ctx", "cfg", "idx", "ptr", "row", "col", "tmp", "acc", "res",
            "data", "item", "pack", "sync", "lock", "pool", "task", "job", "span"]
    out = list(kw)
    while len(out) < n:
        a, b = rng.choice(syll), rng.choice(syll)
        out.append(f"{a}_{b}{rng.randint(0, 100)}")
    return out


@dataclass
class RepoFilesFixture:
    """repo_files rows + golden clusters + labeled pairwise decisions."""

    rows: pd.DataFrame                 # repo,path,commit,lang,content,row_id
    clusters: pd.DataFrame             # row_id, cluster_id (min member id)
    labeled_pairs: pd.DataFrame        # id_l,id_r,block_key,is_match
    meta: dict = field(default_factory=dict)


def _cluster_sizes(rng: np.random.RandomState, n_rows: int) -> list[int]:
    sizes: list[int] = []
    total = 0
    while total < n_rows:
        u = rng.rand()
        if u < 0.60:
            s = 1
        elif u < 0.90:
            s = 2
        elif u < 0.98:
            s = int(rng.randint(3, 11))
        else:
            s = int(rng.randint(11, 51))
        s = min(s, n_rows - total)
        sizes.append(s)
        total += s
    return sizes


def generate_repo_files(n_rows: int = 500, seed: int = 42,
                        n_negative_pairs: int | None = None) -> RepoFilesFixture:
    rng = np.random.RandomState(seed)
    vocab = np.array(_vocab(rng), dtype=object)
    sizes = _cluster_sizes(rng, n_rows)

    rows: list[dict] = []
    cluster_of: list[tuple[str, str]] = []  # (row_id, cluster_id)
    i = 0
    dirs = ["src/main/util", "src/core", "lib/internal", "pkg/api", "cmd/tool",
            "src/test/helpers", "internal/runtime", "app/models"]
    for c_idx, size in enumerate(sizes):
        lang = rng.choice(LANGS, p=LANG_P)
        has_header = rng.rand() < 0.15
        base_len = int(rng.randint(30, 600))
        base = rng.choice(vocab, size=base_len).tolist()
        d = dirs[rng.randint(0, len(dirs))]
        stem = f"{rng.choice(vocab)}_{c_idx}"
        member_ids = [f"r{j:08d}" for j in range(i, i + size)]
        cluster_id = member_ids[0]
        toks = base
        for m in range(size):
            rid = member_ids[m]
            if m > 0:
                # chain mutation: 2-5% token replacements vs previous member
                toks = list(toks)
                n_mut = max(1, int(len(toks) * rng.uniform(0.02, 0.05)))
                pos = rng.randint(0, len(toks), size=n_mut)
                for p in pos:
                    toks[p] = rng.choice(vocab)
            body = toks
            content_toks = (_HEADER + body) if has_header else body
            # light structure: newline every ~12 tokens
            parts = []
            for t_i, t in enumerate(content_toks):
                parts.append(t)
                if t_i % 12 == 11:
                    parts.append("\n")
            content = " ".join(parts)
            # path perturbations for non-first members
            path = f"{d}/{stem}.{EXT[lang]}"
            if m > 0:
                kind = rng.randint(0, 3)
                if kind == 0:
                    d2 = dirs[rng.randint(0, len(dirs))]
                    path = f"{d2}/{stem}.{EXT[lang]}"
                elif kind == 1:
                    path = f"{d}/{stem}_v{m}.{EXT[lang]}"
                else:
                    path = f"{d}/{stem}.{EXT[lang].upper()}"
            rows.append({
                "row_id": rid,
                "repo": f"org{i % 20}/repo{i % 137}",
                "path": path,
                "commit": hashlib.sha256(f"commit{i}".encode()).hexdigest()[:40],
                "lang": str(lang),
                "content": content,
            })
            cluster_of.append((rid, cluster_id))
            i += 1

    rows_df = pd.DataFrame(rows)
    clusters_df = pd.DataFrame(cluster_of, columns=["row_id", "cluster_id"])

    # labeled pairs: all intra-cluster pairs (positive) + sampled same-lang
    # negatives (including header-sharers — the hard negatives).
    pos: list[tuple[str, str, str, bool]] = []
    by_cluster: dict[str, list[str]] = {}
    for rid, cid in cluster_of:
        by_cluster.setdefault(cid, []).append(rid)
    for cid, members in by_cluster.items():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                a, b = sorted((members[x], members[y]))
                pos.append((a, b, f"cluster:{cid}", True))
    if n_negative_pairs is None:
        n_negative_pairs = max(len(pos) * 2, 50)
    cid_map = dict(cluster_of)
    ids = rows_df["row_id"].to_numpy()
    langs = rows_df.set_index("row_id")["lang"].to_dict()
    neg: list[tuple[str, str, str, bool]] = []
    tries = 0
    while len(neg) < n_negative_pairs and tries < n_negative_pairs * 20:
        tries += 1
        a, b = ids[rng.randint(0, len(ids))], ids[rng.randint(0, len(ids))]
        if a == b or cid_map[a] == cid_map[b] or langs[a] != langs[b]:
            continue
        a, b = sorted((a, b))
        neg.append((a, b, f"lang:{langs[a]}", False))
    pairs_df = pd.DataFrame(pos + neg, columns=["id_l", "id_r", "block_key", "is_match"])
    pairs_df = pairs_df.drop_duplicates(subset=["id_l", "id_r"]).reset_index(drop=True)

    return RepoFilesFixture(
        rows=rows_df,
        clusters=clusters_df,
        labeled_pairs=pairs_df,
        meta={"n_rows": n_rows, "seed": seed, "n_clusters": len(sizes),
              "n_multi": sum(1 for s in sizes if s > 1)},
    )


def repo_files_from_documents(documents_df):
    """Shape the driver-provided `documents` table into `repo_files`.

    Lets entry()/bench run the flagship ER pipeline directly over
    /root/testdata parquet without synthesizing new data (TESTDATA.md).
    """
    from pyspark.sql import functions as F

    return documents_df.select(
        F.concat(F.lit("doc/"), F.col("source")).alias("repo"),
        F.concat(F.lit("docs/"), F.col("source"), F.lit("/doc_"),
                 F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.sha2(F.col("doc_id").cast("string"), 256).substr(1, 40).alias("commit"),
        F.col("lang").alias("lang"),
        F.col("text").alias("content"),
        F.format_string("d%08d", F.col("doc_id")).alias("row_id"),
    )
