"""Text analysis & cleaning operators.

Re-expresses the reference's text_processor.py surface (stats 80-94,
regex cleaning patterns 48-56 applied 462-548, encoding-artifact fixes
165-169/527-531, English-stopword language heuristic 171-182, chunking
355-426) as Spark column expressions — every function here returns a
Column or DataFrame built purely from ``pyspark.sql.functions``; no
Python executes per row, so the whole suite stays inside whole-stage
codegen.

Also provides the training-pipeline text ops: language-ID heuristic,
quality scoring, token counting (whitespace + BPE-ish regex), and
rolling-hash document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import config


# --- basic stats (reference text_processor.py:80-94) -----------------------

def word_count(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def line_count(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(c, "\n"))


def sentence_count(col) -> Column:
    """Sentence count via terminal-punctuation splits (the reference
    uses nltk.sent_tokenize; this is the declarative approximation,
    documented divergence per SURVEY.md §7)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.filter(F.split(c, r"[.!?]+"), lambda s: F.trim(s) != ""))


def split_sentences(col, mode: str = "regex") -> Column:
    """array<string> of sentences. mode='regex': terminal-punctuation
    split (matches sentence_count). mode='locale': Spark's built-in
    ``sentences()`` (java.text.BreakIterator) — the closest JVM analog
    to nltk.sent_tokenize (handles abbreviations better than the
    regex); returns each sentence re-joined from its token array."""
    c = F.col(col) if isinstance(col, str) else col
    if mode == "locale":
        return F.transform(F.sentences(c), lambda s: F.array_join(s, " "))
    return F.filter(
        F.transform(F.split(c, r"[.!?]+"), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def char_count(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


# --- cleaning (reference text_processor.py:48-56, 462-548) -----------------

def clean_text(col, remove: list[str] | None = None) -> Column:
    """Chained regexp_replace using the reference's exact patterns.

    remove: subset of config.TEXT_PATTERNS keys, applied in the listed
    order, then whitespace is collapsed and trimmed.
    """
    c = F.col(col) if isinstance(col, str) else col
    remove = remove or ["url", "email", "html_tag"]
    for key in remove:
        c = F.regexp_replace(c, config.TEXT_PATTERNS[key], " ")
    c = F.regexp_replace(c, config.TEXT_PATTERNS["extra_whitespace"], " ")
    return F.trim(c)


def fix_encoding_artifacts(col) -> Column:
    """Replace mojibake sequences (reference text_processor.py:527-531)."""
    c = F.col(col) if isinstance(col, str) else col
    for bad, good in config.ENCODING_ARTIFACTS.items():
        c = F.regexp_replace(c, bad, good)
    return c


def has_encoding_artifacts(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    cond = F.lit(False)
    for bad in config.ENCODING_ARTIFACTS:
        cond = cond | c.contains(bad)
    return cond


# --- language heuristic (reference text_processor.py:171-182) --------------

def _let(bound_expr, body):
    """Lambda-let: evaluate ``bound_expr`` ONCE and bind it into
    ``body`` as a HOF variable. Interpreted HOF lambdas have no
    common-subexpression elimination, so re-referencing an expensive
    expression (a split, a join) inside or across lambdas re-evaluates
    it per element/use — measured 2.7x on minhash shingles
    (dedup.word_shingles)."""
    return F.element_at(F.transform(F.array(bound_expr), body), 1)


def english_stopword_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    stop = F.array(*[F.lit(w) for w in config.EN_STOPWORDS])

    def ratio_of(words):
        hits = F.size(F.filter(words, lambda w: F.array_contains(stop, w)))
        return hits.cast("double") / F.greatest(F.size(words), F.lit(1))

    return _let(F.split(F.lower(F.trim(c)), r"\s+"), ratio_of)


def is_english(col) -> Column:
    return english_stopword_ratio(col) > config.EN_STOPWORD_RATIO


def lang_id_ngram(col) -> Column:
    """Tiny n-gram/stopword language classifier: en/es/de/fr/other.

    Heuristic marker-word voting — deterministic, expression-only; a
    stand-in for a real model at the same plumbing (one withColumn).
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    markers = {
        "en": ["the", "and", "of", "to", "is"],
        "es": ["el", "la", "los", "que", "de"],
        "de": ["der", "die", "das", "und", "ist"],
        "fr": ["le", "la", "les", "est", "une"],
    }

    def best_of(words):
        def marker_hits(ws: list[str]):
            arr = F.array(*[F.lit(w) for w in ws])
            return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))

        scores = [
            F.struct(marker_hits(ws).alias("n"), F.lit(lang).alias("lang"))
            for lang, ws in markers.items()
        ]
        best = F.array_max(F.array(*scores))
        return F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("other"))

    # let-bound: one split feeds all four language filters
    return _let(F.split(F.trim(c), r"\s+"), best_of)


# --- quality scoring --------------------------------------------------------

def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: length, words, mean word length,
    punctuation ratio, stopword ratio, digit ratio, upper ratio.
    One narrow projection — no shuffle."""
    c = F.col(text_col)
    n_chars = F.length(c)
    nz = F.greatest(n_chars, F.lit(1)).cast("double")
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        word_count(c).alias("q_words"),
        (n_chars.cast("double") / F.greatest(word_count(c), F.lit(1))).alias("q_mean_word_len"),
        (
            F.length(F.regexp_replace(c, r"[^\p{Punct}]", "")).cast("double") / nz
        ).alias("q_punct_ratio"),
        english_stopword_ratio(c).alias("q_stopword_ratio"),
        (F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("double") / nz).alias("q_digit_ratio"),
        (F.length(F.regexp_replace(c, r"[^A-Z]", "")).cast("double") / nz).alias("q_upper_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0-100 quality score from the features (weights chosen
    to mirror the reference's deduction style, data_analyzer.py:457-477)."""
    feats = quality_features(df, text_col)
    score = (
        F.lit(100.0)
        - F.when(F.col("q_words") < 5, F.lit(30.0)).otherwise(F.lit(0.0))
        - F.when(F.col("q_punct_ratio") > 0.3, F.lit(20.0)).otherwise(F.lit(0.0))
        - F.when(F.col("q_digit_ratio") > 0.3, F.lit(20.0)).otherwise(F.lit(0.0))
        - F.when(F.col("q_upper_ratio") > 0.5, F.lit(10.0)).otherwise(F.lit(0.0))
        - F.when(F.col("q_mean_word_len") > 15, F.lit(20.0)).otherwise(F.lit(0.0))
    )
    return feats.withColumn("q_score", F.greatest(score, F.lit(0.0)))


# --- token counting ---------------------------------------------------------

# BPE-ish pre-tokenizer: word pieces, numbers, punctuation runs —
# approximates GPT-2-style regex splitting with RE2-compatible syntax.
_BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_count_ws(col) -> Column:
    """Whitespace token count."""
    return word_count(col)


def token_count_bpe(col) -> Column:
    """BPE-ish token count via regexp_extract_all + size (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(_BPE_REGEX), F.lit(0)))


# --- chunking (reference text_processor.py:355-426) -------------------------

def chunk_text(col, chunk_words: int = 64, overlap_words: int = 8) -> Column:
    """Split text into overlapping word-window chunks — the reference's
    chunk_text_for_vector_db as one expression. Returns
    array<struct<id:int, text:string, length:int, n_words:int>>;
    stride = chunk_words - overlap_words."""
    c = F.col(col) if isinstance(col, str) else col
    stride = max(chunk_words - overlap_words, 1)

    def chunks_of(words):
        # words is let-bound: the split runs once per ROW, not once per
        # chunk (interpreted HOF lambdas re-evaluate captured exprs)
        n = F.size(words)
        n_chunks = F.greatest(
            F.ceil((n - F.lit(overlap_words)).cast("double") / stride).cast("int"),
            F.lit(1),
        )
        # chained transforms: the join text is also built once per chunk
        raw = F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("id"),
                F.array_join(F.slice(words, i * stride + 1, chunk_words), " ").alias("text"),
                F.least(n - i * stride, F.lit(chunk_words)).cast("int").alias("n_words"),
            ),
        )
        return F.transform(
            raw,
            lambda ch: F.struct(
                ch["id"].alias("id"),
                ch["text"].alias("text"),
                F.length(ch["text"]).alias("length"),
                ch["n_words"].alias("n_words"),
            ),
        )

    return _let(F.split(F.trim(c), r"\s+"), chunks_of)


def remove_stopwords(col, stopwords: list[str] | None = None) -> Column:
    """Filter stopwords out of the text (reference templates use NLTK,
    text_processor.py:489-518; same semantics, JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    stops = F.array(*[F.lit(w) for w in (stopwords or config.EN_STOPWORDS)])
    kept = F.filter(
        F.split(F.trim(c), r"\s+"),
        lambda w: ~F.array_contains(stops, F.lower(w)),
    )
    return F.array_join(kept, " ")


# --- fingerprinting ---------------------------------------------------------

def doc_fingerprint(col) -> Column:
    """Cheap whole-doc fingerprint: xxhash64 of normalized text
    (lowercased, whitespace-collapsed) — the dedup pre-key."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.xxhash64(norm)


def rolling_fingerprints(col, window: int = 8) -> Column:
    """Rolling-hash fingerprints: hash of every `window`-word shingle,
    keeping the minimum per document (winnowing-lite). Returns bigint.
    Word array let-bound: the split runs once per row, not per shingle."""
    c = F.col(col) if isinstance(col, str) else col

    def fp_of(words):
        n = F.size(words)
        shingles = F.when(
            n >= window,
            F.transform(
                F.sequence(F.lit(0), n - window),
                lambda i: F.xxhash64(F.array_join(F.slice(words, i + 1, window), " ")),
            ),
        ).otherwise(F.array(F.xxhash64(F.array_join(words, " "))))
        return F.array_min(shingles)

    return _let(F.split(F.lower(F.trim(c)), r"\s+"), fp_of)


# --- stemming / lemmatization (F9) ------------------------------------------
#
# The reference's pipeline templates stem/lemmatize with NLTK
# (text_processor.py:489-518). NLTK is not in this environment, so the
# Porter stemmer is implemented from scratch below, from the PUBLIC
# algorithm (M.F. Porter, "An algorithm for suffix stripping",
# Program 14(3), 1980 — original rule set; NLTK's default mode adds
# extensions, so a few suffix classes may differ). This is the
# documented slow-path parity slot: per-unique-token Python inside an
# Arrow-batched pandas UDF with a batch-level cache — the same
# execution shape as the reference's per-token NLTK calls, but
# distributed.

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """Porter's m: number of vowel->consonant transitions in w."""
    m, i, n = 0, 0, len(w)
    while i < n and _is_cons(w, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(w, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(w, i):
            i += 1
    return m


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    n = len(w)
    return (
        n >= 3
        and _is_cons(w, n - 1)
        and not _is_cons(w, n - 2)
        and _is_cons(w, n - 3)
        and w[-1] not in "wxy"
    )


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """Original Porter (1980) stemmer, steps 1a-5b."""
    w = word
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag_1b = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break
    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break
    # step 4 (longest match first within same ending is implicit in the
    # list order for the overlapping cases ement/ment/ent)
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1 and (suf != "ion" or stem.endswith(("s", "t"))):
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and w.endswith("ll"):
        w = w[:-1]
    return w


# Irregular noun forms (standard English morphology, public
# linguistic knowledge) — the reference's WordNetLemmatizer defaults
# to pos='n', so NOUN lemmatization is the behavior to match: it does
# NOT touch verb inflections ('running' stays 'running' at pos='n'),
# and neither does this table+rules combination.
_IRREGULAR_NOUNS = {
    "children": "child", "men": "man", "women": "woman",
    "people": "person", "feet": "foot", "teeth": "tooth",
    "geese": "goose", "mice": "mouse", "lice": "louse", "oxen": "ox",
    "dice": "die", "indices": "index", "matrices": "matrix",
    "vertices": "vertex", "appendices": "appendix",
    "criteria": "criterion", "phenomena": "phenomenon",
    "data": "datum", "media": "medium", "analyses": "analysis",
    "bases": "basis", "crises": "crisis", "theses": "thesis",
    "hypotheses": "hypothesis", "diagnoses": "diagnosis",
    "parentheses": "parenthesis", "axes": "axis", "series": "series",
    "species": "species", "corpora": "corpus", "genera": "genus",
    "alumni": "alumnus", "fungi": "fungus", "nuclei": "nucleus",
    "radii": "radius", "stimuli": "stimulus", "syllabi": "syllabus",
    "cacti": "cactus", "foci": "focus", "loci": "locus",
    "larvae": "larva", "algae": "alga", "antennae": "antenna",
    "leaves": "leaf", "loaves": "loaf", "knives": "knife",
    "lives": "life", "wives": "wife", "halves": "half",
    "calves": "calf", "shelves": "shelf", "wolves": "wolf",
    "thieves": "thief", "scarves": "scarf", "sheep": "sheep",
    "deer": "deer", "fish": "fish",
}


def lemmatize_light(word: str) -> str:
    """Rule-based NOUN lemmatizer — from-scratch parity with the
    reference's WordNetLemmatizer at its DEFAULT pos='n'
    (text_processor.py:489-518): irregular forms from the table above,
    then regular plural suffix rules. Verb/adjective inflections are
    untouched, exactly as wordnet's noun mode leaves them. Remaining
    divergence vs wordnet: nouns whose singular genuinely requires the
    dictionary (e.g. uncountable-only entries) fall through the
    regular rules, and capitalized forms are lemmatized
    case-preserved ('Children' -> 'Child') like this function's
    regular rules ('Tables' -> 'Table'), where wordnet's
    case-sensitive lookup would return them unchanged."""
    lw = word.lower()
    irr = _IRREGULAR_NOUNS.get(lw)
    if irr is not None:
        # preserve the input's casing the way the suffix rules below
        # do naturally — returning the table's lowercase form made
        # 'Children' the one inconsistent case in the function
        if word.isupper() and len(word) > 1:
            return irr.upper()
        if word[:1].isupper():
            return irr[:1].upper() + irr[1:]
        return irr
    if len(word) <= 3:
        return word
    if word.endswith("ies"):
        return word[:-3] + "y"
    if word.endswith(("ches", "shes", "xes", "sses", "zes")):
        return word[:-2]
    if word.endswith("s") and not word.endswith(("ss", "us", "is")):
        return word[:-1]
    return word


def stem_text(col, mode: str = "stem") -> Column:
    """Whitespace-tokenize, stem (or lemmatize) each token, re-join.

    Arrow-batched pandas UDF with a per-batch unique-token cache: real
    corpora repeat tokens heavily, so the Python stemmer runs once per
    DISTINCT token per batch, not once per occurrence.

    CONTRACT: this is an explicit OPT-IN transform — the only
    per-token-Python operator in the package. It must never be
    composed into the hot validation/profile path (validate.py,
    profile.py, rules.py reference it nowhere; pinned by
    test_textops.test_stemmer_stays_out_of_hot_paths)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    fn = porter_stem if mode == "stem" else lemmatize_light

    @pandas_udf("string")
    def _stem(s):  # -> pd.Series of strings (no annotations: pandas_udf
        # resolves hints from module globals, and pandas is imported
        # lazily here; the returnType string above is authoritative)
        cache: dict[str, str] = {}

        def line(x):
            if x is None:
                return None
            return " ".join(
                cache.get(t) or cache.setdefault(t, fn(t.lower()))
                for t in x.split()
            )

        return s.map(line)

    c = F.col(col) if isinstance(col, str) else col
    return _stem(c)


def cleaning_suggestions(
    df: DataFrame, text_col: str = "text", simple: bool = False
) -> "list[dict] | list[str]":
    """Ordered cleaning suggestions composed from corpus-level signals
    (reference text_processor.py:582-643 ``get_cleaning_suggestions``;
    ``simple=True`` mirrors the plain-string variant at :184-216).

    ONE fused aggregation computes every trigger share; the reference
    analyzes a single text eagerly, so its per-text booleans become
    corpus shares here (present = share > 0; the special-character
    trigger keeps the reference's 0.1 ratio threshold as a corpus
    mean). Priority order and wording match the reference so emitted
    reports line up."""
    c = F.col(text_col)
    stripped = F.length(F.regexp_replace(c, config.TEXT_PATTERNS["special_chars"], ""))
    ln = F.length(c)
    row = df.agg(
        F.avg(c.rlike(config.TEXT_PATTERNS["html_tag"]).cast("double")).alias("html"),
        F.avg(c.rlike(config.TEXT_PATTERNS["url"]).cast("double")).alias("url"),
        F.avg(c.rlike(config.TEXT_PATTERNS["email"]).cast("double")).alias("email"),
        F.avg(
            F.when(ln > 0, (ln - stripped).cast("double") / ln).otherwise(F.lit(0.0))
        ).alias("special_ratio"),
        F.avg(c.rlike(r"\s{2,}").cast("double")).alias("ws"),
        F.avg(has_encoding_artifacts(c).cast("double")).alias("enc"),
        F.avg(is_english(c).cast("double")).alias("english"),
    ).collect()[0]

    def present(key: str) -> bool:
        return (row[key] or 0.0) > 0.0

    out: list[dict] = []
    if present("html"):
        out.append({
            "type": "html_removal", "priority": "high",
            "description": "Remove HTML tags from text",
            "template": "basic_cleaning",
            "impact": "Removes formatting artifacts and improves text quality",
        })
    if present("url"):
        out.append({
            "type": "url_removal", "priority": "medium",
            "description": "Remove or extract URLs",
            "template": "basic_cleaning",
            "impact": "Reduces noise and focuses on actual content",
        })
    if present("email"):
        out.append({
            "type": "email_removal", "priority": "medium",
            "description": "Remove or extract email addresses",
            "template": "basic_cleaning",
            "impact": "Reduces noise and protects PII",
        })
    if (row["special_ratio"] or 0.0) > 0.1:
        out.append({
            "type": "special_char_cleanup", "priority": "medium",
            "description": "Clean excessive special characters",
            "template": "basic_cleaning",
            "impact": "Reduces noise and focuses on actual content",
        })
    if present("enc"):
        out.append({
            "type": "encoding_fix", "priority": "high",
            "description": "Fix text encoding issues",
            "template": "document_processing",
            "impact": "Improves text readability and processing accuracy",
        })
    if (row["english"] or 0.0) > 0.5:
        out.append({
            "type": "nlp_processing", "priority": "medium",
            "description": "Apply NLP preprocessing (tokenization, "
                           "lemmatization, stop word removal)",
            "template": "advanced_nlp_cleaning",
            "impact": "Prepares text for machine learning and analysis",
        })
    if present("ws"):
        out.append({
            "type": "whitespace_normalization", "priority": "low",
            "description": "Normalize whitespace and line breaks",
            "template": "document_processing",
            "impact": "Improves text consistency and readability",
        })
    prio = {"high": 3, "medium": 2, "low": 1}
    out.sort(key=lambda s: prio[s["priority"]], reverse=True)  # stable
    if simple:
        # the plain-string variant appends its four unconditional steps
        return [s["description"] for s in out] + [
            "Convert to lowercase",
            "Remove stop words",
            "Apply lemmatization or stemming",
            "Tokenize text",
        ]
    return out


# --- before/after change report (reference text_processor.py:645-718) -------

def text_change_report(
    original: DataFrame, cleaned: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus-level before/after text-change report — the distributed
    analog of the reference's per-text ``generate_text_report`` /
    ``_analyze_text_changes`` / ``_compare_text_quality``
    (text_processor.py:645-718): character/word/sentence/vocabulary
    change, removed-element counts (urls/emails/html tags), derived
    quality terms (average_chars_per_word, vocabulary_richness), and
    resolved-issue doc counts (contains_html / contains_urls /
    encoding_issues), as long-format rows
    ``(metric, before, after, change)``.

    Cost model: ONE fused aggregation per side (every term is an
    algebraic sum over a narrow projection — no shuffle beyond the
    final one-row agg); the driver assembles the tiny report frame.
    NULL texts count as empty strings on both sides.
    """
    spark = original.sparkSession

    def side(df: DataFrame) -> dict:
        c = F.coalesce(F.col(text_col), F.lit(""))
        t = F.trim(c)
        words = F.split(F.trim(F.lower(c)), r"\s+")
        n_words = F.when(t == "", F.lit(0)).otherwise(F.size(words))
        n_distinct = F.when(t == "", F.lit(0)).otherwise(
            F.size(F.array_distinct(words))
        )
        n_sentences = F.size(
            F.filter(F.split(c, r"[.!?]+"), lambda s: F.trim(s) != "")
        )
        row = df.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length(c)).alias("total_chars"),
            F.sum(n_words).alias("total_words"),
            F.sum(n_sentences).alias("total_sentences"),
            F.sum(n_distinct).alias("distinct_words"),
            F.sum(F.regexp_count(c, F.lit(config.TEXT_PATTERNS["url"]))).alias("urls"),
            F.sum(F.regexp_count(c, F.lit(config.TEXT_PATTERNS["email"]))).alias("emails"),
            F.sum(
                F.regexp_count(c, F.lit(config.TEXT_PATTERNS["html_tag"]))
            ).alias("html_tags"),
            F.sum(c.rlike(config.TEXT_PATTERNS["html_tag"]).cast("long")).alias(
                "docs_with_html"
            ),
            F.sum(c.rlike(config.TEXT_PATTERNS["url"]).cast("long")).alias(
                "docs_with_urls"
            ),
            F.sum(has_encoding_artifacts(c).cast("long")).alias(
                "docs_with_encoding_artifacts"
            ),
        ).collect()[0]
        return {k: float(row[k] or 0) for k in row.asDict()}

    b = side(original)
    a = side(cleaned)

    rows: list[tuple] = []
    for m in (
        "n_docs",
        "total_chars",
        "total_words",
        "total_sentences",
        "distinct_words",
        "urls",
        "emails",
        "html_tags",
        "docs_with_html",
        "docs_with_urls",
        "docs_with_encoding_artifacts",
    ):
        rows.append((m, b[m], a[m], a[m] - b[m]))
    # derived quality terms (reference _compare_text_quality wording)
    acw_b = b["total_chars"] / max(b["total_words"], 1.0)
    acw_a = a["total_chars"] / max(a["total_words"], 1.0)
    rows.append(("average_chars_per_word", acw_b, acw_a, acw_a - acw_b))
    vr_b = b["distinct_words"] / max(b["total_words"], 1.0)
    vr_a = a["distinct_words"] / max(a["total_words"], 1.0)
    rows.append(("vocabulary_richness", vr_b, vr_a, vr_a - vr_b))
    # reference summary terms: length_reduction + reduction_percentage
    red = b["total_chars"] - a["total_chars"]
    rows.append(("length_reduction", b["total_chars"], a["total_chars"], -red))
    pct = (red / b["total_chars"] * 100.0) if b["total_chars"] > 0 else 0.0
    rows.append(("reduction_percentage", None, None, pct))
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("metric", T.StringType(), False),
            T.StructField("before", T.DoubleType(), True),
            T.StructField("after", T.DoubleType(), True),
            T.StructField("change", T.DoubleType(), True),
        ]
    )
    return spark.createDataFrame(rows, schema)
