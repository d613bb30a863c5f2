"""Text-analysis column helpers for the training-data-pipeline extension.

All pure built-in expressions (split / higher-order array functions /
md5) — no Python UDFs — so they run inside whole-stage codegen and are
reproducible in the DuckDB oracle with the same primitives.

Tokenization contract: ``split(trim(text), ' ')`` — single-space
splitting, identical in Spark and DuckDB (``string_split``), chosen
over regex splitting to avoid engine-specific regex semantics in the
correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small deterministic stopword lists per language for the language-ID
# heuristic and quality scoring.
STOPWORDS_EN = ("the", "a", "of", "and", "is", "to", "in")
STOPWORDS_ES = ("el", "la", "de", "y", "es")
STOPWORDS_FR = ("le", "la", "de", "et", "est")


def tokens(col: Column | str) -> Column:
    """Whitespace tokens (single-space contract, see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("bigint")


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    in_list = ", ".join(f"'{w}'" for w in words)
    return F.size(F.filter(toks, lambda x: x.isin(*words))).cast("bigint")


def stopword_count(col: Column | str, words: tuple[str, ...] = STOPWORDS_EN) -> Column:
    return _count_in(tokens(col), words)


def stopword_ratio(col: Column | str, words: tuple[str, ...] = STOPWORDS_EN) -> Column:
    return F.try_divide(stopword_count(col, words), token_count(col))


def avg_token_len(col: Column | str) -> Column:
    """Mean token length = (chars - spaces) / tokens, computed
    arithmetically so the oracle can reproduce it exactly."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    n_tok = token_count(col)
    n_nonspace = F.length(trimmed) - (n_tok - F.lit(1))
    return F.try_divide(n_nonspace.cast("double"), n_tok)


def lang_id(col: Column | str) -> Column:
    """Deterministic n-gram/stopword language-ID heuristic: argmax of
    per-language stopword hits with a fixed tie order (en > es > fr).
    """
    toks = tokens(col)
    s_en = _count_in(toks, STOPWORDS_EN)
    s_es = _count_in(toks, STOPWORDS_ES)
    s_fr = _count_in(toks, STOPWORDS_FR)
    return (
        F.when((s_en >= s_es) & (s_en >= s_fr), F.lit("en"))
        .when(s_es >= s_fr, F.lit("es"))
        .otherwise(F.lit("fr"))
    )


# BPE-ish pre-tokenization pattern: letter runs, digit runs, and single
# non-space symbols — the coarse split BPE tokenizers apply before
# merges. Plain character classes only, so Java (Spark) and RE2-style
# (oracle) regex engines agree.
BPE_SPLIT_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def bpe_token_count(col: Column | str) -> Column:
    """Approximate subword-ish token count via the BPE pre-tokenizer
    split (an upper bound on whitespace tokens, a lower bound on true
    BPE tokens)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), F.lit(0))).cast(
        "bigint"
    )


def fingerprint(col: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted token
    bag. Two documents that are word-permutations of each other collide
    — the canonical "fingerprinting" near-dup key.
    """
    return F.md5(F.array_join(F.array_sort(tokens(col)), " "))


def winnow_fingerprints(col: Column | str, k: int = 3, w: int = 4) -> Column:
    """Winnowing fingerprint set (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    the MOSS algorithm): hash every word-``k``-gram, slide a window of
    ``w`` consecutive hashes, keep each window's minimum; the distinct
    selected hashes are the document's fingerprint.

    This is the rolling-hash subsampling rung of the dedup ladder:
    ~1/w of the shingle space with the winnowing GUARANTEE that any
    shared run of at least w+k-1 tokens yields at least one shared
    fingerprint — unlike uniform sampling, which can miss arbitrarily
    long overlaps. Pure array expressions (transform/slice/array_min),
    map-side, zero shuffle; md5-derived so the DuckDB oracle replays
    the selection exactly. Documents shorter than w shingles contribute
    their single overall minimum; documents with no ``k``-gram yield [].
    """
    c = F.col(col) if isinstance(col, str) else col
    hs = F.transform(shingles(c, k), lambda s: F.substring(F.md5(s), 1, 8))
    n = F.size(hs)
    n_win = F.greatest(F.lit(1), n - F.lit(w - 1))
    wins = F.transform(
        F.sequence(F.lit(1), n_win), lambda i: F.array_min(F.slice(hs, i, w))
    )
    return F.when(n > 0, F.array_distinct(wins)).otherwise(
        F.array().cast("array<string>")
    )


# PII patterns shared by the Spark redactor and the DuckDB oracle.
# Plain character classes + \S only, so Java (Spark) and RE2 (oracle)
# regex engines produce identical matches; trailing '-' inside classes
# is literal in both. Redaction order is URL → EMAIL → PHONE so the
# digits inside a URL or an email local-part are gone before the
# phone pattern runs.
PII_URL = "https?://\\S+"
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE = "\\+?[0-9][0-9 -]{5,}[0-9]"
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (PII_URL, "<URL>"),
    (PII_EMAIL, "<EMAIL>"),
    (PII_PHONE, "<PHONE>"),
)


PII_CARD = "\\b[0-9]{13,19}\\b"


def luhn_valid(col: Column | str) -> Column:
    """Luhn checksum (ISO/IEC 7812) as a pure JVM expression: strip
    non-digits, reverse, double every second digit (−9 past 9), sum,
    valid iff ≡ 0 (mod 10) and the digit count is card-shaped
    (13–19). Built-ins only — split/transform-with-index/aggregate —
    so it runs inside whole-stage codegen AND inside higher-order
    lambdas (redact_cards filters candidate spans with it), and the
    identical arithmetic replays in the SQL oracle."""
    c = F.col(col) if isinstance(col, str) else col
    ds = F.regexp_replace(c, "[^0-9]", "")
    digits = F.filter(
        F.split(F.reverse(ds), ""), lambda x: x != F.lit("")
    )
    terms = F.transform(
        digits,
        lambda x, i: F.when(i % 2 == 0, x.cast("int")).otherwise(
            F.when(x.cast("int") * 2 < 10, x.cast("int") * 2).otherwise(
                x.cast("int") * 2 - 9
            )
        ),
    )
    total = F.aggregate(terms, F.lit(0), lambda a, b: a + b)
    return (
        F.length(ds).between(13, 19) & (total % 10 == 0)
    )


def redact_cards(col: Column | str) -> Column:
    """Replace card-shaped digit runs with <CARD> ONLY when they pass
    the Luhn checksum — a bare \\b[0-9]{13,19}\\b regex would also
    eat order numbers, tracking ids, and timestamps-as-ints, which is
    exactly the over-redaction that degrades training text (~10% of
    random digit runs pass Luhn, so the checksum removes ~90% of the
    false redactions). regexp cannot branch on a checksum, so the
    shape is: extract candidate spans → filter by ``luhn_valid`` →
    fold literal replaces — all higher-order built-ins on the row's
    own candidate array (bounded by the text's digit-run count), still
    map-only/JVM-side, zero shuffle at any scale."""
    c = F.col(col) if isinstance(col, str) else col
    cands = F.array_distinct(F.regexp_extract_all(c, F.lit(PII_CARD), F.lit(0)))
    valid = F.filter(cands, luhn_valid)
    # fold with \b-anchored regexp_replace, NOT a literal substring
    # replace: the candidates were extracted at word boundaries, and a
    # boundary-less fold would also rewrite the same digit run when it
    # appears INSIDE a longer run elsewhere in the text (e.g. a
    # 20-digit order id containing the card's 16 digits), corrupting
    # non-card text. Candidates are digits-only, so they are
    # regex-metacharacter-safe to embed verbatim.
    return F.aggregate(
        valid,
        c,
        lambda acc, s: F.regexp_replace(
            acc, F.concat(F.lit("\\b"), s, F.lit("\\b")), F.lit("<CARD>")
        ),
    )


def redact_pii(col: Column | str) -> Column:
    """Replace every Luhn-valid card number, then every URL / email /
    phone-shaped span, with a typed placeholder token. Cards run FIRST
    (Luhn-gated, see ``redact_cards``) because the phone pattern would
    otherwise swallow card-shaped runs under the wrong token; the rest
    is a pure regexp_replace chain. JVM-side, fuses into the scan; at
    100 TB this is a map-only pass with zero shuffle."""
    c = redact_cards(col)
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


# Mojibake digraphs: the UTF-8-decoded-as-Latin-1 double-encoding
# signatures of common Western characters (é → 'Ã©', ’ → 'â€™', …)
# plus the replacement char a lossy decode leaves behind. Literal
# substrings, NOT regexes — detection and repair use replace
# arithmetic, identical in Spark and the DuckDB oracle. Longest
# first so the repair chain's overlapping prefixes ('â€œ' vs 'â€™')
# consume deterministically in both engines.
MOJIBAKE_MAP: tuple[tuple[str, str], ...] = (
    ("â€™", "’"),  # â€™ → ’
    ("â€œ", "“"),  # â€œ → “
    ("â€“", "–"),  # â€“ → –
    ("Ã©", "é"),  # Ã© → é
    ("Ã¨", "è"),  # Ã¨ → è
    ("Ã¼", "ü"),  # Ã¼ → ü
    ("Ã±", "ñ"),  # Ã± → ñ
    ("Ã¶", "ö"),  # Ã¶ → ö
    ("Ã ", "à"),  # Ã  → à
)
REPLACEMENT_CHAR = "�"


def mojibake_count(col: Column | str) -> Column:
    """Number of mojibake-signature hits in the text: occurrences of
    the double-encoding digraphs in MOJIBAKE_MAP plus lossy-decode
    replacement chars. Pure length/replace arithmetic (no regex, no
    UDF) so it fuses into the scan and replays integer-exactly in the
    SQL oracle — the cheap encoding-QA gate a web-crawl curation pass
    runs before any model sees the text."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.lit(0)
    for bad, _ in MOJIBAKE_MAP + ((REPLACEMENT_CHAR, ""),):
        total = total + (
            F.length(c) - F.length(F.replace(c, F.lit(bad), F.lit("")))
        ) / len(bad)
    return total.cast("bigint")


def demojibake(col: Column | str) -> Column:
    """Repair the enumerated double-encoding digraphs (replace chain
    in MOJIBAKE_MAP order) and strip replacement chars — the bounded,
    SQL-replayable repair for the dominant Latin-1/UTF-8 confusion
    class. A full generic repair (re-encode latin-1, re-decode utf-8)
    is NOT expressible as JVM builtins and genuinely needs a Pandas
    UDF; this chain covers the high-frequency signatures without
    leaving whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    for bad, good in MOJIBAKE_MAP:
        c = F.replace(c, F.lit(bad), F.lit(good))
    return F.replace(c, F.lit(REPLACEMENT_CHAR), F.lit(""))


def repair_mojibake_text(s: str, max_rounds: int = 3) -> str:
    """FULL generic mojibake repair for one string (driver/worker-side
    pure function — the Python body ``demojibake_full`` ships to
    executors): strip replacement chars, then repair each
    space-delimited word by the cp1252→UTF-8 round trip (encode the
    word back to the bytes a Windows-1252 mis-decode would have read,
    re-decode them as UTF-8), iterated to a fixpoint so double-encoded
    text ('ÃƒÂ©' → 'Ã©' → 'é') also recovers. Word-wise, because a
    plain space (0x20) can never be produced by mis-decoding a UTF-8
    multi-byte sequence (lead bytes are ≥0xC2, continuations
    0x80–0xBF), so spaces are safe segment boundaries — a word that
    cannot encode to cp1252/latin-1 (e.g. CJK) or whose bytes are not
    valid UTF-8 (e.g. genuine 'café') is left untouched. ASCII words
    are identity by construction. cp1252 first (the 0x80–0x9F
    smart-quote block 'â€™' needs it), latin-1 as fallback for the
    five codepoints cp1252 lacks.

    Known false-positive class (inherent to every round-trip
    heuristic): a CLEAN word whose cp1252 bytes happen to be valid
    multi-byte UTF-8 — e.g. 'ßš' (0xDF 0x9A, a valid 2-byte
    sequence) — would be "repaired" into a different string. In the
    pipeline this is doubly mitigated: ``demojibake_full`` only
    touches rows the signature detector flags, and such adjacencies
    (a 0xC2–0xF4-encoding char directly followed by 0x80–0xBF-encoding
    ones) are vanishingly rare in natural text."""
    s = s.replace(REPLACEMENT_CHAR, "")
    out = []
    for w in s.split(" "):
        for _ in range(max_rounds):
            try:
                b = w.encode("cp1252")
            except UnicodeEncodeError:
                try:
                    b = w.encode("latin-1")
                except UnicodeEncodeError:
                    break
            try:
                w2 = b.decode("utf-8")
            except UnicodeDecodeError:
                break
            if w2 == w:
                break
            w = w2
        out.append(w)
    return " ".join(out)


def demojibake_full(df, text_col: str = "text"):
    """Opt-in FULL mojibake repair over a DataFrame (round 11 — the
    tail-closer behind the enumerated ``demojibake`` chain): rows
    FLAGGED by ``mojibake_count`` > 0 get the generic
    ``repair_mojibake_text`` round trip through an Arrow-batched
    pandas_udf; everything else passes through untouched on the
    JVM-only branch. The filter runs FIRST (same pattern as the
    multimodal container decodes), so the Python node sees only the
    flagged sliver — on a clean web crawl that is ~0% of rows and the
    pass stays map-only/codegen for the other 99%+. Detection scope =
    the enumerated signature map plus replacement chars; a row whose
    ONLY mojibake is outside the map does not flag (broaden
    MOJIBAKE_MAP to broaden the gate). Returns the frame with
    ``text_col`` replaced; column order preserved."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # NOTE: no type hints on the udf — this module uses
    # `from __future__ import annotations`, which stringifies them and
    # breaks pandas_udf's signature inference; the explicit returnType
    # + default SCALAR eval type carry the same contract.
    @pandas_udf("string")
    def _repair(col):
        return col.map(
            lambda x: x if x is None else repair_mojibake_text(x)
        )

    flag = F.coalesce(mojibake_count(text_col) > 0, F.lit(False))
    cols = df.columns
    flagged = df.filter(flag).withColumn(text_col, _repair(F.col(text_col)))
    clean = df.filter(~flag)
    return flagged.select(*cols).unionByName(clean.select(*cols))


# Query params a crawl canonicalizer strips: click/campaign trackers
# that vary per visit without changing the document. Literal prefixes,
# matched case-sensitively (crawlers lowercase param names upstream).
TRACKING_PARAM_RE = "^(utm_[a-z_]*|fbclid|gclid|msclkid|ref)="


def canonical_url(col: Column | str) -> Column:
    """Canonical form of a URL — THE dedup key a web-crawl pipeline
    hashes before any content fetch (the cheapest dedup rung, ahead of
    exact text hashing): two crawl records of the same page with
    different click trackers / param order / host case collapse to one
    key. Rules (each a pure JVM expression; RE2-safe regexes so the
    DuckDB oracle replays them verbatim):

      1. scheme and host:port lowercase (path/query case PRESERVED —
         paths are case-sensitive on most origins);
      2. default port stripped (:443 for https, :80 for http);
      3. fragment dropped (never sent to the origin);
      4. tracking params removed (``TRACKING_PARAM_RE``);
      5. remaining query params sorted lexicographically (param order
         is almost never semantic);
      6. empty path normalized to '/'.

    Map-only: fuses into the scan, zero shuffle at any scale. This is
    the conservative canonicalizer — it never merges two URLs that
    could serve different content; aggressive variants (strip 'www.',
    lowercase path, drop ALL params) are policy choices layered on
    top."""
    u = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    host = F.when(
        scheme == "https", F.regexp_replace(hostport, ":443$", "")
    ).when(
        scheme == "http", F.regexp_replace(hostport, ":80$", "")
    ).otherwise(hostport)
    # fragment off first, then split path vs query
    nofrag = F.regexp_replace(
        F.substring(rest, F.length(hostport) + F.lit(1), F.lit(1 << 20)),
        "#.*$",
        "",
    )
    path = F.regexp_extract(nofrag, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(
        nofrag.contains("?"),
        F.regexp_replace(nofrag, r"^[^?]*\?", ""),
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(
            F.lit("")
        ),
    )


def shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-gram shingles as an array<string>; [] when < k tokens.

    Built by zip_with-folding k shifted slices of the token array
    (shingle i = t[i] ‖ t[i+1] ‖ … ‖ t[i+k−1]) — ~35% faster than the
    transform-over-indices form because it avoids a per-window slice
    allocation inside the lambda.
    """
    toks = tokens(col)
    n_sh = F.size(toks) - (k - 1)
    acc = F.slice(toks, 1, n_sh)
    for j in range(2, k + 1):
        acc = F.zip_with(
            acc, F.slice(toks, j, n_sh), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(F.size(toks) >= k, acc).otherwise(
        F.array().cast("array<string>")
    )


def normalize_text(col: Column | str) -> Column:
    """Canonical text normalization — the step every dedup/decontam
    hash runs AFTER, so near-identical surface forms ("Hello,  World!"
    vs "hello world") collapse to one canonical key:

      lowercase → strip non-alphanumerics to spaces → collapse
      whitespace runs → trim.

    Pure JVM column expressions (fuses into the scan), idempotent by
    construction (property-tested), and written with only regex
    constructs both Java regex and RE2 share (explicit character
    classes, no lookaround) so a DuckDB oracle replays it verbatim.
    ASCII-class scope: [^a-z0-9 ] strips accents/CJK too — the
    aggressive exact-dedup key, not a display form; swap the class for
    \\p{L}\\p{N} when a Unicode-preserving key is wanted."""
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(c)
    stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", " ")
    collapsed = F.regexp_replace(stripped, " +", " ")
    return F.trim(collapsed)


def readability_stats(text_col: str = "text"):
    """Flesch reading-ease ingredients + score as pure JVM column
    expressions — the readability heuristic educational-quality
    curation filters use (FineWeb-Edu-style screens gate on exactly
    this class of signal). Syllables are approximated as VOWEL GROUPS
    ([aeiouy]+ on the lowercased text — the standard cheap estimator;
    consistent across engines because RE2 and Java regex agree on this
    pattern), sentences as terminal-punctuation runs ([.!?]+, floored
    at 1 so unpunctuated fixtures stay finite), words as whitespace
    tokens.

        flesch = 206.835 − 1.015·(words/sentences)
                         − 84.6·(syllables/words)

    Returns a list of named Columns: n_words, n_sentences,
    n_syllables, flesch — every arithmetic node is the literal
    expression tree above so a SQL oracle replays bit-for-bit.
    """
    from pyspark.sql import functions as F

    words = F.size(tokens(text_col)).cast("bigint")
    sents = F.greatest(
        F.lit(1).cast("bigint"),
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")).cast("bigint"),
    )
    syls = F.regexp_count(
        F.lower(F.col(text_col)), F.lit("[aeiouy]+")
    ).cast("bigint")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sents.cast("double"))
        - F.lit(84.6) * (syls.cast("double") / words.cast("double"))
    )
    return [
        words.alias("n_words"),
        sents.alias("n_sentences"),
        syls.alias("n_syllables"),
        flesch.alias("flesch"),
    ]
