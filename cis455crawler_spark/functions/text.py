"""Text-analysis column functions — tokenization, stopwords, language ID,
quality scoring, token counting, document fingerprinting.

Tokenization + stopword list re-express the reference indexer's pipeline
(/root/reference/Indexer/src/edu/upenn/cis455/mapreduce/job/Indexer.java:28-56
stopword list; :150-185 markup/punct skipping; lowercasing at
FileManagement.java:121-134). The reference lemmatizes with StanfordCoreNLP;
the rebuild uses a deterministic regex tokenizer (the text-equality invariant
of the engine is on extracted text, not lemmas — SURVEY.md §2 O-X8).

Language-ID / quality / token-count / fingerprint are the training-data
pipeline additions; all pure Column expressions (JVM, codegen) so they run at
corpus scale with zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as _T

# the reference's 25 hardcoded stopwords (Indexer.java:28-56)
STOPWORDS = [
    "a", "about", "an", "and", "are", "as", "at", "be", "by", "com", "for",
    "from", "how", "in", "is", "it", "of", "on", "or", "that", "the", "this",
    "to", "was", "what",
]

_TOKEN_SPLIT = r"[^a-z0-9]+"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def bind_once(expr: Column, fn) -> Column:
    """Evaluate `expr` exactly once per row and pass the result to `fn` as a
    cheap lambda variable — a 'let' binding for Column expressions.

    Spark has no let: composing `fn(expensive_expr)` duplicates the
    expression tree per reference, and a reference inside a higher-order-
    function lambda re-evaluates it PER ARRAY ELEMENT (HOF bodies get no
    subexpression elimination) — that turned shingles() into an O(n^2)
    re-tokenize per document before round 5. The one-element
    transform(array(e), fn) forces a single evaluation and binds the result
    to a NamedLambdaVariable; Catalyst cannot inline it back. Overhead is
    one single-element array allocation per row."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def tokenize(text: Column | str) -> Column:
    """lowercase -> split on non-alphanumeric -> drop empties.
    ARRAY<STRING>, JVM-side."""
    toks = F.split(F.lower(_c(text)), _TOKEN_SPLIT)
    return F.filter(toks, lambda t: t != "")


def remove_stopwords(tokens: Column) -> Column:
    """Drop the reference's 25 stopwords (O-F8)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.filter(tokens, lambda t: ~F.array_contains(sw, t))


def lemma_lite(token: Column) -> Column:
    """Rule-based English suffix lemmatizer (O-X8 approximation), pure JVM.

    The reference lemmatizes with StanfordCoreNLP
    (Indexer/.../FileManagement.java:68-72) — a model-based pipeline that
    cannot be byte-replicated without its jars, so this is a DOCUMENTED
    DEVIATION: a deterministic porter-lite that folds the regular English
    inflections (plural -s/-es/-ies, -ing, -ed) with minimal-stem guards.
    Applied per-token (use inside F.transform over a token array)."""
    t = token
    # order matters: longest suffix first; guards keep stems >= 3 chars
    t = F.when(t.rlike(r"^[a-z]{3,}ies$"), F.regexp_replace(t, "ies$", "y")).otherwise(t)
    t = F.when(t.rlike(r"^[a-z]{2,}(sses|xes|ches|shes|zes)$"), F.regexp_replace(t, "es$", "")).otherwise(t)
    t = F.when(t.rlike(r"^[a-z]{4,}ing$") & ~t.rlike(r"(ing|ying)ing$"), F.regexp_replace(t, "ing$", "")).otherwise(t)
    t = F.when(t.rlike(r"^[a-z]{4,}ied$"), F.regexp_replace(t, "ied$", "y")).otherwise(t)
    t = F.when(t.rlike(r"^[a-z]{4,}ed$") & ~t.rlike(r"eed$"), F.regexp_replace(t, "ed$", "")).otherwise(t)
    t = F.when(
        t.rlike(r"^[a-z]{3,}s$") & ~t.rlike(r"(ss|us|is)$"), F.regexp_replace(t, "s$", "")
    ).otherwise(t)
    return t


def lemmatize_tokens(tokens: Column) -> Column:
    """lemma_lite over an ARRAY<STRING> of tokens."""
    return F.transform(tokens, lemma_lite)


def token_count(text: Column | str) -> Column:
    """Whitespace-delimited token count (cheap proxy for a BPE count)."""
    t = F.trim(_c(text))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


# BPE-ish pre-tokenization classes (GPT-2-style, simplified to constructs
# shared by Java regex, DuckDB RE2, and Python re so one pattern serves the
# engine, the SQL oracle, and tests): letter runs, digit runs, runs of other
# non-space symbols. A real BPE count sub-splits these by merge rules; this
# upper-bounds sequence length per pre-token and is the standard cheap proxy.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_count_bpe(text: Column | str) -> Column:
    """BPE-style pre-token count (letters / digits / symbol runs)."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(BPE_TOKEN_PATTERN), 0))


def word_char_ratio(text: Column | str) -> Column:
    """Fraction of characters that are alphanumeric/space — a quality signal."""
    t = _c(text)
    clean = F.length(F.regexp_replace(t, r"[^A-Za-z0-9 ]", ""))
    return F.when(F.length(t) > 0, clean / F.length(t)).otherwise(F.lit(0.0))


# tiny per-language stopword seeds for the n-gram-free heuristic language ID
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "sich"],
    "fr": ["le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour"],
    "es": ["el", "los", "las", "es", "en", "una", "por", "con", "para", "del"],
}


def lang_marker_hits(text: Column | str, lang: str) -> Column:
    """How many of `lang`'s marker words occur in the token set."""
    toks = F.array_distinct(tokenize(text))
    markers = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
    return F.size(F.array_intersect(toks, markers))


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: the language whose marker words hit most;
    'und' (undetermined) when no marker hits."""
    hits = [
        F.struct(lang_marker_hits(text, lang).alias("hits"), F.lit(lang).alias("lang"))
        for lang in _LANG_MARKERS
    ]
    best = F.array_max(F.array(*hits))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality score: length band + alnum ratio + stopword
    presence (C4/Gopher-style cheap filters, expressed as one column)."""
    t = _c(text)
    n_tok = token_count(t)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    ratio = word_char_ratio(t)
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    has_stop = F.when(
        F.size(F.array_intersect(F.array_distinct(tokenize(t)), sw)) > 0, F.lit(1.0)
    ).otherwise(F.lit(0.0))
    return F.round((len_ok + ratio + has_stop) / F.lit(3.0), 6)


def fingerprint64(text: Column | str) -> Column:
    """64-bit document fingerprint (xxhash64 over the normalized text) — the
    rolling-hash dedup key. Normalization: lowercase, collapse whitespace."""
    norm = F.regexp_replace(F.lower(F.trim(_c(text))), r"\s+", " ")
    return F.xxhash64(norm)


def fingerprint_md5(text: Column | str) -> Column:
    """Same normalization pipeline as fingerprint64 with an md5 digest —
    the oracle-verifiable variant (md5 exists in DuckDB/Python; xxhash64 is
    engine-specific). Production dedup keeps the cheaper 64-bit key."""
    norm = F.regexp_replace(F.lower(F.trim(_c(text))), r"\s+", " ")
    return F.md5(norm)


def _max_run_count(arr: Column) -> Column:
    """Multiplicity of the most frequent element of an ARRAY<STRING>:
    sort, then longest run of equal adjacent elements via one aggregate
    scan. O(n log n) per row, pure JVM — no shuffle, no Python. This is
    the scale-correct shape for per-document mode statistics: an
    explode+groupBy per doc would turn an embarrassingly parallel map
    into two corpus-wide shuffles."""
    s = F.array_sort(arr)
    run = lambda a, x: F.when(x == a["prev"], a["run"]).otherwise(F.lit(0)) + 1
    return F.aggregate(
        s,
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")),
        lambda a, x: F.struct(
            x.alias("prev"),
            run(a, x).alias("run"),
            F.greatest(a["best"], run(a, x)).alias("best"),
        ),
        lambda a: a["best"],
    )


def top_ngram_fraction(text: Column | str, n: int = 2) -> Column:
    """Gopher-style repetition signal: fraction of the document's n-gram
    occurrences taken by the single most frequent n-gram (Gopher/MassiveText
    'top n-gram fraction', Rae et al. 2021 §A1.1, expressed over token
    counts). High values flag boilerplate/keyword-stuffed pages. 0.0 for
    documents with fewer than n tokens: shingles() falls back to one
    whole-text shingle there, which would trivially own 100% of the
    occurrences and flag every short doc as maximally repetitive
    (ADVICE r3) — too short to repeat an n-gram means not repetitive."""

    def _over_toks(toks: Column) -> Column:
        def _over_grams(grams: Column) -> Column:
            frac = _max_run_count(grams) / F.size(grams)
            return F.when(F.size(toks) < n, F.lit(0.0)).otherwise(frac.cast("double"))

        return bind_once(shingles(toks, n), _over_grams)

    return bind_once(tokenize(text), _over_toks)


def dup_ngram_fraction(text: Column | str, n: int = 3) -> Column:
    """Fraction of n-gram occurrences that are repeats of an earlier
    occurrence (Gopher's 'duplicate n-gram fraction' family): 1 -
    distinct/total. Pure columns; 0.0 for token-less documents."""

    def _over_toks(toks: Column) -> Column:
        def _over_grams(grams: Column) -> Column:
            frac = (F.size(grams) - F.size(F.array_distinct(grams))) / F.size(grams)
            return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(frac.cast("double"))

        return bind_once(shingles(toks, n), _over_grams)

    return bind_once(tokenize(text), _over_toks)


def dup_line_fraction(text: Column | str) -> Column:
    """Fraction of non-blank lines that duplicate another line (Gopher's
    'duplicate line fraction') — catches nav menus / footer spam repeated
    down a page. 0.0 for documents with no non-blank lines."""

    def _over_lines(lines: Column) -> Column:
        nl = F.size(lines)
        frac = (nl - F.size(F.array_distinct(lines))) / nl
        return F.when(nl == 0, F.lit(0.0)).otherwise(frac.cast("double"))

    return bind_once(
        F.filter(
            F.transform(F.split(_c(text), r"\n"), lambda l: F.trim(l)),
            lambda l: l != "",
        ),
        _over_lines,
    )


# PII patterns, restricted to regex constructs with identical semantics in
# Java regex (Spark executors), RE2 (DuckDB oracle), and Python re (tests):
# char classes, bounded repetition, \d, word boundary. Ordered: email first
# so its digits-and-dots domain can never be half-eaten by the IP rule.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+\d{1,3}[ -]\d{3}[ -]\d{3,4}([ -]\d{1,4})?", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def redact_pii(text: Column | str) -> Column:
    """Replace emails, international-format phone numbers, and IPv4
    addresses with typed placeholder tokens ([EMAIL]/[PHONE]/[IP]) —
    the standard pre-training redaction pass (RefinedWeb §3.4 does
    exactly this class of regex scrub). Chained JVM regexp_replace;
    zero Python."""
    t = _c(text)
    for _, pat, repl in PII_PATTERNS:
        t = F.regexp_replace(t, pat, repl)
    return t


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-type PII match counts (audit columns for the redaction pass),
    counted SEQUENTIALLY on the progressively redacted text (ADVICE r3):
    email is counted on the raw text then redacted, phone on the
    email-redacted text, and so on — mirroring redact_pii's replacement
    order exactly, so each count equals the number of replacements that
    type actually makes (independent counting would double-count, e.g.
    digits-and-dots inside an email local part also matching the phone/IP
    patterns)."""
    t = _c(text)
    out: dict[str, Column] = {}
    for name, pat, repl in PII_PATTERNS:
        out[name] = F.regexp_count(t, F.lit(pat))
        t = F.regexp_replace(t, pat, repl)
    return out


def shingles(tokens: Column, k: int = 3) -> Column:
    """k-token shingles as strings — input to MinHash/Jaccard dedup.
    JVM-side: transform over a sequence of start offsets.

    The `tokens` argument is bound ONCE per row through a single-element
    outer transform before the per-position lambda references it. Without
    that binding, callers that pass a computed expression (the universal
    shape is `shingles(tokenize(text), k)`) pay the expression per shingle
    position: HOF lambda bodies are evaluated per element with no
    subexpression elimination, so the document regexp-tokenize re-ran for
    every one of its own n-k+1 windows — O(n^2) per document. Measured at
    sf0.1 (5k docs, 225k grams): 3.5 s -> 0.6 s for the gram pass. A
    caller-side `.select(tokenize(...).alias("toks"))` projection fixes
    one call site; binding here fixes them all and survives Catalyst's
    project-collapsing."""

    def _over(t: Column) -> Column:
        n = F.size(t)
        idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
        return F.when(
            n >= k, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i + 1, k)))
        ).otherwise(F.array(F.concat_ws(" ", t)))

    return bind_once(tokens, _over)


@F.pandas_udf(_T.StringType())
def _nfc_kernel(s):
    import unicodedata

    return s.map(
        lambda x: x if x is None else unicodedata.normalize("NFC", x)
    )


def normalize_nfc(text: Column | str) -> Column:
    """Unicode NFC normalization — the canonical-composition pass every
    web-text pipeline runs before hashing/dedup (CCNet normalizes before
    hashing; HTML entity + mojibake cleanup feeds the same step). The JVM
    expression library has no normalizer, so this is the one text op that
    drops to Python: an Arrow-batched pandas UDF (module-level, built
    once) calling unicodedata.normalize('NFC', ...) — per-batch vectorized
    transfer, no per-row Python in the plan around it. Compose with
    collapse_whitespace() (pure JVM) for the full cleanup."""
    return _nfc_kernel(_c(text))


def collapse_whitespace(text: Column | str) -> Column:
    """Collapse runs of whitespace to single spaces and trim — pure JVM."""
    return F.trim(F.regexp_replace(_c(text), r"\s+", " "))


# Unicode script classes (BMP ranges; the classes RE2 and Java regex both
# express identically, so one table serves the engine and the SQL oracle)
SCRIPT_CLASSES = {
    "latin": "[A-Za-z]",
    "cyrillic": "[Ѐ-ӿ]",
    "greek": "[Ͱ-Ͽ]",
    "cjk": "[一-鿿]",
}


def script_counts(text: Column | str) -> dict[str, Column]:
    """Per-script character counts — the writing-system profile used to
    (a) route documents to script-specific tokenizers/normalizers and
    (b) flag mixed-script spam (Cyrillic homoglyphs inside Latin words is
    a classic cloaking trick). Pure JVM regexp_count per class."""
    t = _c(text)
    return {
        name: F.regexp_count(t, F.lit(pat))
        for name, pat in SCRIPT_CLASSES.items()
    }


def dominant_script(text: Column | str) -> Column:
    """Script with the highest character count; ties break to the
    lexicographically LARGEST script name (struct-max semantics — the
    same deterministic rule on every engine); 'none' when no script
    character occurs at all."""
    counts = script_counts(text)
    pairs = [
        F.struct(c.alias("cnt"), F.lit(name).alias("name"))
        for name, c in counts.items()
    ]
    best = F.array_max(F.array(*pairs))
    return F.when(best["cnt"] > 0, best["name"]).otherwise(F.lit("none"))
