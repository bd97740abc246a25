"""Spellcheck (SURVEY §2.8 N4) + known-entity anti-filter (§2.3 J3).

Behavior-parity reimplementation of the reference's spellCheck
(/root/reference/controllers/spellCheck.js:6-56) and the entity filter
(/root/reference/index.js:1486-1523), as pure Column algebra + joins:

- pre-pass: URL masking (urlSanitizer regex families) and blanking of
  alphanumeric tokens like `123abc` (spellCheck.js:8-12)
- a "misspelling" is a token absent from the dictionary relation —
  the hunspell lookup becomes a LEFT-ANTI JOIN against a broadcast
  dictionary table (retext-spell's per-token dictionary probe is
  exactly an anti-join in relational form)
- J3: misspellings whose normalized tokens (or depluralized forms,
  trailing 's' stripped) appear in the known-entity word set are
  dropped — a second left-anti join (index.js:1505-1521)

Positions are (line, word_idx) — line numbers match the reference
(line-break-preserving pre-pass, spellCheck.js:12); the column is the
token ordinal rather than a character offset (documented deviation:
char columns need a per-token running sum that buys no verification
power here).

Scale shape: tokens explode on (doc, line); dictionary and entity
tables broadcast (≪10 MB); one shuffle only if the caller aggregates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# urlSanitizer families (/root/reference/controllers/urlSanitizer.js:4-83)
_URL_RES = [
    r"data:[^\s]+",
    r"(?:https?|ftp)://[^\s]+",
    r"www\.[^\s]+",
    r"\b[a-z0-9-]+(?:\.[a-z0-9-]+)+(?:/[^\s]*)?\b",
]
_ALNUM_MIX = r"[0-9]+[a-zA-Z]+"


def mask_urls_col(text: Column | str) -> Column:
    """F12: mask URL-like spans, blank alphanumeric tokens, collapse
    spaces but PRESERVE line breaks (line numbers stay accurate)."""
    t = F.col(text) if isinstance(text, str) else text
    for pat in _URL_RES:
        t = F.regexp_replace(t, f"(?i){pat}", " ")
    t = F.regexp_replace(t, _ALNUM_MIX, " ")
    t = F.regexp_replace(t, r"\r\n", "\n")
    return F.regexp_replace(t, r"[ \t]+", " ")


def normalize_entity_col(s: Column) -> Column:
    """X1 normalizeEntity (/root/reference/controllers/entityParser.js:83-90)."""
    out = F.regexp_replace(s, r"['’]", "")
    out = F.regexp_replace(out, r"[^A-Za-z0-9]+", " ")
    return F.lower(F.trim(out))


def doc_tokens(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(doc, line, word_idx, word) after the reference pre-pass; words
    are stripped of edge punctuation and lowercased for dictionary
    probing (original kept as `word`)."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(mask_urls_col(text_col), "\n")).alias("_ln", "_line"),
    )
    toks = lines.select(
        F.col(id_col),
        (F.col("_ln") + 1).alias("line"),
        F.posexplode(
            F.filter(F.split(F.col("_line"), " "), lambda w: w != "")
        ).alias("word_idx", "_raw"),
    )
    word = F.regexp_replace(F.col("_raw"), r"^[^A-Za-z]+|[^A-Za-z]+$", "")
    return toks.select(
        F.col(id_col), "line", "word_idx",
        word.alias("word"), F.lower(word).alias("word_lc"),
    ).filter(F.col("word") != "")


def misspellings(
    docs: DataFrame,
    dictionary: DataFrame,
    entities: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """N4 + J3: (doc, line, word_idx, word) not in `dictionary(word)`,
    minus words whose normalized/depluralized form is a known entity
    token in `entities(entity)` (per-corpus table; the reference's
    per-article Set becomes a join keyed by doc when entities carry
    `id_col`)."""
    toks = doc_tokens(docs, id_col, text_col)
    dict_lc = F.broadcast(
        dictionary.select(F.lower("word").alias("word_lc")).distinct()
    )
    missed = toks.join(dict_lc, "word_lc", "left_anti")
    if entities is not None:
        ent_tokens = (
            entities.select(
                F.explode(
                    F.filter(
                        F.split(normalize_entity_col(F.col("entity")), " "),
                        lambda w: w != "",
                    )
                ).alias("tok")
            )
            .select(
                F.explode(
                    F.array_distinct(
                        F.array(
                            F.col("tok"),
                            # reference also admits the plural: a token
                            # whose SINGULAR form is known is dropped, so
                            # the plural joins too (index.js:1513-1517)
                            F.concat(F.col("tok"), F.lit("s")),
                        )
                    )
                ).alias("word_key")
            )
            .distinct()
        )
        missed = missed.join(
            F.broadcast(ent_tokens),
            missed["word_lc"] == ent_tokens["word_key"],
            "left_anti",
        )
    return missed.select(id_col, "line", "word_idx", "word")


# ------------------------------------------------------- N4 suggestions
# retext-spell returns edit-distance suggestions per misspelling
# (/root/reference/controllers/spellCheck.js:29-55, `expected`). The
# deterministic relational form: dictionary words within Levenshtein
# distance `max_distance`, alphabetical, capped. Candidate generation is
# the symspell deletes-table join (Garbe's public algorithm): keys =
# word ∪ single-char deletions on BOTH sides; two words at distance ≤ 1
# always share a key, so the join bounds the search without a cross
# join — the dict-keys table is a one-time broadcast build.


def _deletes1_col(word: Column) -> Column:
    """word ∪ all single-character deletions (symspell key set)."""
    return F.array_union(
        F.array(word),
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: F.concat(
                word.substr(F.lit(1), i - 1),
                word.substr(i + 1, F.length(word)),
            ),
        ),
    )


def suggest_corrections(
    missed: DataFrame,
    dictionary: DataFrame,
    max_suggestions: int = 5,
    max_distance: int = 1,
    id_cols: tuple[str, ...] = ("doc_id", "line", "word_idx"),
) -> DataFrame:
    """Add a `suggestions` column (comma-joined, alphabetical, capped at
    max_suggestions; '' when none) to a misspellings frame."""
    dict_keys = F.broadcast(
        dictionary.select(F.lower("word").alias("_dw"))
        .distinct()
        .select("_dw", F.explode(_deletes1_col(F.col("_dw"))).alias("_key"))
        .distinct()
    )
    keyed = missed.select(
        *id_cols, "word", F.lower("word").alias("_wl")
    ).select(
        *id_cols, "word", "_wl",
        F.explode(_deletes1_col(F.col("_wl"))).alias("_key"),
    )
    cand = keyed.join(dict_keys, "_key").filter(
        F.levenshtein(F.col("_wl"), F.col("_dw")) <= max_distance
    )
    agg = cand.groupBy(*id_cols, "word").agg(
        F.array_join(
            F.slice(
                F.sort_array(F.collect_set("_dw")), 1, max_suggestions
            ),
            ",",
        ).alias("suggestions")
    )
    return missed.join(agg, [*id_cols, "word"], "left").select(
        *id_cols, "word",
        F.coalesce(F.col("suggestions"), F.lit("")).alias("suggestions"),
    )
