"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

All hot-path expressions are JVM-side (pyspark.sql.functions inside
whole-stage codegen) — no Python UDFs.  Each has an ANSI-SQL twin used by
the DuckDB correctness oracle.
"""

from __future__ import annotations

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " und ", " die ", " das ", " ist "],
    "fr": [" le ", " et ", " les ", " des ", " est "],
    "es": [" el ", " y ", " los ", " de la ", " es "],
}


def token_count_col(text_col):
    """Whitespace token count: JVM-side arithmetic on lengths (exact,
    consistent-with-SQL semantics regardless of split() edge cases)."""
    from pyspark.sql import functions as F

    # tokens = non-space runs = (spaces removed length > 0 segments)
    # count boundaries: number of [^ ]+ matches
    return F.when(F.length(F.trim(text_col)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text_col), r"\s+"))
    )


def token_count_sql(text_expr: str) -> str:
    return (
        f"cast(case when length(trim({text_expr})) = 0 then 0 "
        f"else len(string_split_regex(trim({text_expr}), '\\s+')) end as int)"
    )


def quality_score_col(text_col):
    """Quality features: alpha ratio, space ratio, mean token length.
    Score = round(0.5*alpha_ratio + 0.3*(1 - punct_ratio) + 0.2*space_balance, 4)
    where punct_ratio = non-alnum-non-space chars / length."""
    from pyspark.sql import functions as F

    n = F.length(text_col).cast("double")
    alpha = F.length(F.regexp_replace(text_col, r"[^A-Za-z]", "")).cast("double")
    space = F.length(F.regexp_replace(text_col, r"[^ ]", "")).cast("double")
    punct = F.length(F.regexp_replace(text_col, r"[A-Za-z0-9 ]", "")).cast("double")
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    punct_ratio = F.when(n > 0, punct / n).otherwise(F.lit(0.0))
    space_ratio = F.when(n > 0, space / n).otherwise(F.lit(0.0))
    score = 0.5 * alpha_ratio + 0.3 * (1.0 - punct_ratio) + 0.2 * space_ratio
    return F.round(score, 4)


def quality_score_sql(t: str) -> str:
    n = f"cast(length({t}) as double)"
    alpha = f"cast(length(regexp_replace({t}, '[^A-Za-z]', '', 'g')) as double)"
    space = f"cast(length(regexp_replace({t}, '[^ ]', '', 'g')) as double)"
    punct = f"cast(length(regexp_replace({t}, '[A-Za-z0-9 ]', '', 'g')) as double)"
    ar = f"case when {n} > 0 then {alpha} / {n} else 0.0 end"
    pr = f"case when {n} > 0 then {punct} / {n} else 0.0 end"
    sr = f"case when {n} > 0 then {space} / {n} else 0.0 end"
    return f"round(0.5 * ({ar}) + 0.3 * (1.0 - ({pr})) + 0.2 * ({sr}), 4)"


def lang_id_col(text_col):
    """Marker-stopword language heuristic: argmax of per-language marker
    hit counts; 'und' (undetermined) when all zero.  Deterministic
    tie-break by language code order de<en<es<fr."""
    from pyspark.sql import functions as F

    padded = F.concat(F.lit(" "), F.lower(text_col), F.lit(" "))

    def hits(lang):
        c = F.lit(0)
        for m in LANG_MARKERS[lang]:
            # occurrences of marker m
            c = c + (F.length(padded) - F.length(F.replace(padded, F.lit(m), F.lit("")))) / len(m)
        return c.cast("long")

    scores = {lang: hits(lang) for lang in sorted(LANG_MARKERS)}
    best = None
    best_score = None
    for lang in sorted(LANG_MARKERS):
        s = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def lang_id_sql(t: str) -> str:
    padded = f"(' ' || lower({t}) || ' ')"

    def hits(lang):
        parts = []
        for m in LANG_MARKERS[lang]:
            esc = m.replace("'", "''")
            parts.append(
                f"(length({padded}) - length(replace({padded}, '{esc}', ''))) / {len(m)}"
            )
        return "cast(" + " + ".join(parts) + " as bigint)"

    langs = sorted(LANG_MARKERS)
    score_exprs = {lang: hits(lang) for lang in langs}
    best = f"'{langs[0]}'"
    best_score = score_exprs[langs[0]]
    for lang in langs[1:]:
        s = score_exprs[lang]
        best = f"case when ({s}) > ({best_score}) then '{lang}' else {best} end"
        best_score = f"case when ({s}) > ({best_score}) then ({s}) else ({best_score}) end"
    return f"case when ({best_score}) > 0 then {best} else 'und' end"


def fingerprint_col(text_col):
    """Document fingerprint: first 16 hex chars of md5 (rolling-hash
    analogue, portable across engines)."""
    from pyspark.sql import functions as F

    return F.substring(F.md5(text_col.cast("string")), 1, 16)


def fingerprint_sql(t: str) -> str:
    return f"substring(md5(cast({t} as varchar)), 1, 16)"
