"""Response/markup parsing kernels (SURVEY.md §2.7 X1, X10-X13, §2.2 F1).

The reference parses LLM free-text responses with regexes and string
searches; our engine has no LLM, but the parsing operators themselves are
part of the capability surface (a user replaying the reference's staged
files through this engine needs them). Semantics reproduced from the
cited reference lines; implementations are Spark-native where possible,
Arrow-batched otherwise.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql import types as T


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# X10 — yes/no answer parse (OneNet/data_process.py:115-141 semantics:
# look for an explicit yes; negative wordlist beats it; empty -> null)
# ---------------------------------------------------------------------------

_NEGATIVES = ["no", "not", "cannot", "n't", "incorrect", "wrong", "false"]


def parse_yes_no(col: str | Column) -> Column:
    """Returns true/false/null(string unparseable or empty)."""
    s = F.lower(F.trim(_c(col)))
    has_yes = s.rlike(r"\byes\b") | s.startswith("y")
    has_neg = s.rlike(r"\b(" + "|".join(_NEGATIVES) + r")\b")
    return (
        F.when(F.length(s) == 0, F.lit(None).cast("boolean"))
        .when(has_neg, F.lit(False))
        .when(has_yes, F.lit(True))
        .otherwise(F.lit(None).cast("boolean"))
    )


def pointwise_filter(df, response_col: str, keep_col_name: str = "keep"):
    """F1: one pass, two logical branches. Returns (kept_df, failed_df) —
    the reference writes 'yes' rows onward and empties to a fail file
    (OneNet/data_process.py:158-170)."""
    tagged = df.withColumn(keep_col_name, parse_yes_no(response_col))
    kept = tagged.filter(F.col(keep_col_name) == True)  # noqa: E712
    failed = tagged.filter(F.col(keep_col_name).isNull())
    return kept, failed


# ---------------------------------------------------------------------------
# X11 — first-occurring category by find() position
# (OneNet/data_process.py:143-156 semantics)
# ---------------------------------------------------------------------------

def extract_first_category(col: str | Column, categories: list[str]) -> Column:
    """The category whose name occurs earliest in the text; ties by list
    order; null if none occur."""
    s = F.lower(_c(col))
    pos_structs = F.array(
        *[
            F.struct(
                F.when(F.instr(s, c.lower()) > 0, F.instr(s, c.lower()))
                .otherwise(F.lit(2**31 - 1))
                .alias("pos"),
                F.lit(i).alias("ord"),
                F.lit(c).alias("cat"),
            )
            for i, c in enumerate(categories)
        ]
    )
    best = F.array_min(pos_structs)
    return F.when(best["pos"] < 2**31 - 1, best["cat"]).otherwise(F.lit(None))


# ---------------------------------------------------------------------------
# X13 — JSON-in-string extract (Sparkle/eval.py:80-93 semantics:
# re.search(r'{.*}') then json.loads)
# ---------------------------------------------------------------------------

def extract_embedded_json(col: str | Column, schema: str) -> Column:
    """First {...} span parsed with the given schema; null on failure."""
    blob = F.regexp_extract(_c(col), r"(\{.*\})", 1)
    return F.from_json(blob, schema)


# ---------------------------------------------------------------------------
# X1 — brace-span extraction (Sparkle/core.py:16-28 semantics: stack-parse
# {…} spans out of marked-up text; returns text + start offset in the
# unmarked string). Stateful parse -> Arrow UDF.
# ---------------------------------------------------------------------------

_SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("text", T.StringType()),
            T.StructField("start", T.IntegerType()),
        ]
    )
)


def extract_brace_spans(marked: str) -> list[tuple[str, int]]:
    """Pure-python oracle: spans of top-level {...} in `marked`, with start
    offsets relative to the text with braces removed."""
    out = []
    depth = 0
    plain_pos = 0
    start_plain = 0
    buf_start = -1
    for ch in marked:
        if ch == "{":
            if depth == 0:
                start_plain = plain_pos
                buf_start = plain_pos
            depth += 1
        elif ch == "}" and depth > 0:
            depth -= 1
            if depth == 0:
                out.append((None, start_plain, plain_pos))  # fill text later
        else:
            plain_pos += 1
    # rebuild plain text to slice span texts
    plain = re.sub(r"[{}]", "", marked)
    return [(plain[s:e], s) for (_n, s, e) in out]


@F.pandas_udf(_SPAN_TYPE)
def brace_spans_udf(marked: pd.Series) -> pd.Series:
    return pd.Series(
        [
            [{"text": t, "start": s} for t, s in extract_brace_spans(m or "")]
            for m in marked.tolist()
        ]
    )


# ---------------------------------------------------------------------------
# X12 — result decode: find which candidate id/name a free-text answer
# refers to (OneNet/data_process.py:351-396 semantics: id substring first,
# then space-stripped name match; deterministic tie-break by first position,
# then name length, then lexicographic).
# ---------------------------------------------------------------------------

_DECODE_TYPE = T.StructType(
    [
        T.StructField("matched_id", T.StringType()),
        T.StructField("match_pos", T.IntegerType()),
    ]
)


@F.pandas_udf(_DECODE_TYPE)
def decode_answer_udf(answer: pd.Series, cand_ids: pd.Series, cand_names: pd.Series) -> pd.DataFrame:
    ids_out, pos_out = [], []
    for ans, ids, names in zip(answer.tolist(), cand_ids.tolist(), cand_names.tolist()):
        ans = ans or ""
        squashed = ans.replace(" ", "").lower()
        best = None  # (pos, len(name), name, id)
        ids = list(ids) if ids is not None else []
        names = list(names) if names is not None else []
        for cid, name in zip(ids, names):
            p = ans.find(cid) if cid else -1
            if p < 0 and name:
                p = squashed.find(name.replace(" ", "").lower())
            if p >= 0:
                key = (p, len(name or ""), name or "", cid)
                if best is None or key < best:
                    best = key
        ids_out.append(best[3] if best else None)
        pos_out.append(best[0] if best else None)
    return pd.DataFrame({"matched_id": ids_out, "match_pos": pd.array(pos_out, dtype="Int32")})


# ---------------------------------------------------------------------------
# X3/X4 — context reconstruction + sentence cut
# ---------------------------------------------------------------------------

def reconstruct_context(left: str | Column, mention: str | Column,
                        right: str | Column, marker: str = "###") -> Column:
    """X3: left + ' ###' + mention + '### ' + right (OneNet/prompt.py:19)."""
    return F.concat(
        _c(left), F.lit(f" {marker}"), _c(mention), F.lit(f"{marker} "), _c(right)
    )


def cut_context(left: str | Column, right: str | Column) -> tuple[Column, Column]:
    """X4: keep the tail after the last '.' of the left context and the
    first sentence of the right context (OneNet/data_process.py:172-191)."""
    cut_left = F.element_at(F.split(_c(left), r"\.", -1), -1)
    cut_right = F.concat(F.substring_index(_c(right), ".", 1), F.lit("."))
    return cut_left, cut_right
