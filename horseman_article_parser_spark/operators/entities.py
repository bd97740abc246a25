"""Named-entity extraction cascade (SURVEY §2.8 N2, §2.3 J4, §2.4 A12,
§2.7 X1-X5).

Behavior-parity subset of the reference's entityParser
(/root/reference/controllers/entityParser.js): deterministic
capitalized-run recognition followed by the reference's cleanup
cascade — possessive strip (helpers.js:81-96), honorific merge
(entityParser.js:636-667), job-title tail trim (:437-459, word sets
:39-70), discourse/sentence-starter trim (:553,568-588), first-
occurrence dedupe on the normalized key (:1582-1594), sub-name
suppression (:1660-1729) and the people×places anti-filter
(:1742-1747). The reference's statistical recognizer (`compromise`) is
replaced by a deterministic capitalization grammar with broadcast
gazetteer/org/hint sets — the cleanup semantics, which its own test
suite actually pins, are preserved verbatim.

Spark surface: one Arrow pass emits (kind, entity) arrays per document;
dedupe/anti-joins are relational on the exploded rows. Hint and
gazetteer sets are broadcast (≪ 10 MB).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

HONORIFICS = {"mr", "mrs", "ms", "miss", "dr", "prof", "sir", "dame", "lord", "lady"}
JOB_TITLE_PREPOSITIONS = set(
    "at for with from by via in on to into onto through within without over under "
    "against toward towards around across after before during since because while "
    "when where among between per including inside outside along behind beyond "
    "upon amid amidst amongst beside besides concerning regarding about according "
    "off of".split()
)
JOB_TITLE_CORE = set(
    "advisor adviser advocate ambassador analyst architect artist associate "
    "attorney author captain ceo chair chairman chairwoman chairperson chief "
    "cofounder coo cfo cto cmo cio commissioner consultant coordinator creator "
    "curator dean developer designer director editor educator engineer "
    "entrepreneur executive fellow founder founders governor head instructor "
    "investigator investor journalist lawyer lecturer leader lead manager "
    "minister musician nurse officer owner partner philanthropist photographer "
    "physician pilot planner president principal producer professor programmer "
    "psychologist researcher reporter scientist singer specialist strategist "
    "student surgeon teacher technician technologist trustee vice vp svp evp".split()
)
JOB_TITLE_MODIFIERS = set(
    "academic acting adjunct administrative administration advanced ai analytics "
    "applied assistant associate business capital chief client clinical "
    "commercial communications community compliance content corporate creative "
    "customer data digital economic education engineering enterprise "
    "environmental equity executive financial global government growth health "
    "human impact industrial innovation insights institutional interim "
    "international investment legal logistics marketing medical national "
    "operations operational partnership people performance policy portfolio "
    "press principal private product production program project public quality "
    "regional reliability research resources sales senior software solution "
    "solutions strategic strategy support sustainability talent tech technical "
    "technology trade training transport venture".split()
)
SENTENCE_STARTERS = {"we", "our", "ours", "the", "this", "that", "these", "those", "however"}
DISCOURSE_STARTERS = {"however", "meanwhile", "later", "moreover", "furthermore", "speaker"}

# small built-in gazetteers (broadcastable; extensible via args)
PLACES = {
    "paris", "london", "madrid", "berlin", "rome", "tokyo", "moscow", "beijing",
    "new york", "new zealand", "united states", "united kingdom", "france",
    "germany", "spain", "italy", "china", "japan", "russia", "india", "canada",
    "australia", "brazil", "mexico", "glasgow", "scotland", "wales", "ireland",
    "europe", "asia", "africa", "america",
}
ORGS = {
    "google", "microsoft", "apple", "amazon", "facebook", "meta", "cisco",
    "cisco meraki", "slack", "example corp", "ofgem", "nasa", "bbc", "reuters",
    "energy saving trust",
}
ORG_SUFFIXES = {"corp", "inc", "ltd", "llc", "plc", "gmbh", "co", "group", "trust"}

_POSSESSIVE_RE = re.compile(r"(['’]s|['’])\s*$", re.IGNORECASE)
_TRAIL_PUNCT_RE = re.compile(r"[.,;:!?\s]+$")
_CAP_WORD_RE = re.compile(r"^[A-ZÀ-Þ][\w'’.-]*$", re.UNICODE)
_INITIAL_RE = re.compile(r"^[A-Z]\.?$")
_TOKEN_RE = re.compile(r"[^\s]+")


def strip_possessive(s: str) -> str:
    """X2 (/root/reference/helpers.js:81-96)."""
    out = _TRAIL_PUNCT_RE.sub("", s)
    out = _POSSESSIVE_RE.sub("", out)
    return _TRAIL_PUNCT_RE.sub("", out)


def normalize_entity(s: str) -> str:
    """X1 (/root/reference/controllers/entityParser.js:83-90)."""
    out = re.sub(r"['’]", "", s)
    out = re.sub(r"[^A-Za-z0-9À-þ]+", " ", out)
    return out.strip().lower()


def _canonical(word: str) -> str:
    return normalize_entity(word).replace("-", "").replace(" ", "")


def _trim_job_title_tail(words: list[str]) -> list[str]:
    """detectJobTitleTail semantics (entityParser.js:437-459): a name of
    ≥3 words whose tail (from index ≥2) is job-title vocabulary loses
    the tail."""
    if len(words) < 3:
        return words
    canon = [_canonical(w) for w in words]
    for i in range(2, len(canon)):
        if canon[i] in JOB_TITLE_CORE or canon[i] in JOB_TITLE_MODIFIERS:
            # walk back over contiguous title vocabulary
            start = i
            while start > 2 and (
                canon[start - 1] in JOB_TITLE_CORE
                or canon[start - 1] in JOB_TITLE_MODIFIERS
            ):
                start -= 1
            if start >= 2:
                return words[:start]
    return words


def _trim_discourse_starter(words: list[str]) -> list[str]:
    while len(words) >= 2 and normalize_entity(words[0]) in DISCOURSE_STARTERS:
        words = words[1:]
    return words


def _trim_sentence_starter_tail(words: list[str]) -> list[str]:
    while len(words) >= 2 and normalize_entity(words[-1]) in SENTENCE_STARTERS:
        words = words[:-1]
    return words


def _cap_runs(text: str, hints: dict | None) -> list[list[str]]:
    """Maximal runs of capitalized tokens (with initials and hyphenated
    parts), split on list commas."""
    runs: list[list[str]] = []
    for segment in re.split(r"[,;:()\[\]]| and | or ", text):
        current: list[str] = []

        def close() -> None:
            nonlocal current
            if current:
                runs.append(current)
            current = []

        for m in _TOKEN_RE.finditer(segment):
            tok = m.group(0)
            bare = tok.strip(".,;:!?\"“”")
            if _CAP_WORD_RE.match(bare) or _INITIAL_RE.match(bare):
                current.append(tok.strip(",;:!?\"“”"))
                # sentence-ending punctuation closes the run — unless the
                # token is a single-letter initial ("A." in a name)
                is_initial = len(bare) == 1 and bare.isupper()
                if tok.rstrip("\"'”’").endswith((".", "!", "?")) and not is_initial:
                    close()
            else:
                close()
        close()
    return runs


def _split_adjacent_firsts(words: list[str], first_hints: set[str]) -> list[list[str]]:
    """W10-lite: 'John Mary' with both in the first-name hint set splits
    into two single names (entityParser.js:851-884)."""
    if len(words) == 2:
        a, b = normalize_entity(words[0]), normalize_entity(words[1])
        if a in first_hints and b in first_hints:
            return [[words[0]], [words[1]]]
    return [words]


def extract_entities(text: str | None, hints: dict | None = None) -> dict:
    """Per-document kernel → {people, places, orgs, topics} (each a
    first-occurrence-deduped list of cleaned entity strings)."""
    if not text:
        return {"people": [], "places": [], "orgs": [], "topics": []}
    hints = hints or {}
    first_hints = {normalize_entity(x) for x in hints.get("first", [])}
    first_hints |= {
        normalize_entity(x) for x in (hints.get("secondary") or {}).get("people", [])
    }
    places_gaz = PLACES | {normalize_entity(x) for x in hints.get("places", [])}
    orgs_gaz = ORGS | {normalize_entity(x) for x in hints.get("orgs", [])}

    people: list[str] = []
    places: list[str] = []
    orgs: list[str] = []
    topics: list[str] = []

    def add(bucket: list[str], name: str, seen: set[str]) -> None:
        key = normalize_entity(name)
        if key and key not in seen:
            seen.add(key)
            bucket.append(name[0].upper() + name[1:])

    seen_p: set[str] = set()
    seen_pl: set[str] = set()
    seen_o: set[str] = set()
    seen_t: set[str] = set()

    for run in _cap_runs(text, hints):
        words = [strip_possessive(w) if i == len(run) - 1 else w
                 for i, w in enumerate(run)]
        words = [w for w in (w.strip() for w in words) if w]
        if not words:
            continue
        # leading article 'The' before a gazetteer entity
        if len(words) >= 2 and normalize_entity(words[0]) == "the":
            words = words[1:]
        words = _trim_discourse_starter(words)
        words = _trim_sentence_starter_tail(words)
        if not words:
            continue
        phrase = " ".join(strip_possessive(w) for w in words)
        phrase = strip_possessive(phrase)
        key = normalize_entity(phrase)
        if not key:
            continue
        if key in places_gaz:
            add(places, phrase, seen_pl)
            add(topics, phrase, seen_t)
            continue
        if key in orgs_gaz or (
            len(words) >= 2 and normalize_entity(words[-1]) in ORG_SUFFIXES
        ):
            add(orgs, phrase, seen_o)
            add(topics, phrase, seen_t)
            continue
        # person path: strip job-title tail, normalize initials
        words = _trim_job_title_tail(words)
        for split in _split_adjacent_firsts(words, first_hints):
            cleaned = [w[:-1] if _INITIAL_RE.match(w) and w.endswith(".") else w
                       for w in split]
            # honorific-only or single stop-word runs are noise
            if not cleaned:
                continue
            if len(cleaned) == 1 and normalize_entity(cleaned[0]) in (
                SENTENCE_STARTERS | DISCOURSE_STARTERS | HONORIFICS
            ):
                continue
            name = strip_possessive(" ".join(cleaned))
            if not name:
                continue
            add(people, name, seen_p)
            add(topics, name, seen_t)

    # J4: people that equal detected places are places, not people
    place_keys = {normalize_entity(p) for p in places}
    people = [p for p in people if normalize_entity(p) not in place_keys]

    # sub-name suppression (entityParser.js:1660-1729): drop single-word
    # people that prefix a longer extracted name
    multi_tokens = set()
    for p in people:
        toks = normalize_entity(p).split()
        if len(toks) > 1:
            multi_tokens.update(toks)
    people = [
        p for p in people
        if " " in p or normalize_entity(p) not in multi_tokens
    ]

    return {"people": people, "places": places, "orgs": orgs, "topics": topics}


ENTITIES_STRUCT = T.StructType(
    [
        T.StructField("people", T.ArrayType(T.StringType())),
        T.StructField("places", T.ArrayType(T.StringType())),
        T.StructField("orgs", T.ArrayType(T.StringType())),
        T.StructField("topics", T.ArrayType(T.StringType())),
    ]
)


def extract_entities_df(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    hints: dict | None = None,
) -> DataFrame:
    """DataFrame op: adds an `entities` struct column (one Arrow pass;
    hint sets ride the closure = broadcast once per executor)."""
    out_schema = T.StructType(
        [docs.schema[id_col], T.StructField("entities", ENTITIES_STRUCT)]
    )
    hints_local = hints

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "entities": [
                        extract_entities(t, hints_local) for t in pdf[text_col]
                    ],
                }
            )

    return docs.mapInPandas(run, schema=out_schema)


def entities_exploded(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", hints: dict | None = None) -> DataFrame:
    """(doc, kind, pos, entity) rows — the relational surface for
    dedupe/anti-join compositions (J3/J4 downstream)."""
    ent = extract_entities_df(docs, id_col, text_col, hints)
    parts = []
    for kind in ("people", "places", "orgs", "topics"):
        parts.append(
            ent.select(
                F.col(id_col),
                F.lit(kind).alias("kind"),
                F.posexplode_outer(F.col(f"entities.{kind}")).alias("pos", "entity"),
            ).filter(F.col("entity").isNotNull())
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
