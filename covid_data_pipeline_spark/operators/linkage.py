"""Probabilistic record linkage: Fellegi–Sunter match scoring.

The reference deduplicates nothing — its admin-region rows arrive
pre-keyed (reference `airflow/dags/scripts/process_covid_raw.py`
trusts `Country_Region` as-is). A warehouse ingesting entities from
multiple sources needs the classic linkage decision layer ON TOP of
blocking: candidate pairs come from a blocking scheme (sorted
neighborhood / LSH / prefix filter — all in `operators/dedup.py`), and
each pair is scored by the Fellegi–Sunter log-likelihood ratio
(Fellegi & Sunter, JASA 1969) over per-field agreement indicators:

    score = sum_i  agree_i ? ln(m_i/u_i) : ln((1-m_i)/(1-u_i))

where m_i = P(field i agrees | pair is a match) and u_i = P(agrees |
non-match). Positive score ⇒ the agreement pattern is likelier under
the match hypothesis.

Exactness: m/u are estimated from labeled pairs as Laplace-smoothed
integer count ratios, each weight is ONE deterministic IEEE
``ln(int_product / int_product)`` rounded to integer micro-nats
(the DSIR construction — ln agrees to <1 ulp cross-engine, far from
the rounding boundary), and a pair's score is a BIGINT sum of those
integer weights — so the whole scored relation hash-matches a SQL
replay.

Scale: the weight model is ONE single-row aggregate over the labeled
pairs (2 + 2·|fields| BIGINT counters) broadcast back; scoring is a
pure codegen projection over the candidate pairs. No corpus-sized
state, no iteration (the unsupervised-EM variant would add iteration;
with planted or clerically-labeled training pairs the closed form is
exact).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fs_linkage_scores"]


def _w_micro(num: Column, den: Column) -> Column:
    """round(ln(num/den) * 1e6) as BIGINT — num/den are exact integer
    products, the division+ln is one IEEE expression."""
    return F.round(
        F.log(num.cast("double") / den.cast("double")) * 1e6, 0
    ).cast("bigint")


def fs_linkage_scores(
    pairs: DataFrame,
    match_col: str,
    field_cols: Sequence[str],
    score_col: str = "score_micro",
) -> DataFrame:
    """Score candidate pairs by the Fellegi–Sunter log-likelihood
    ratio in integer micro-nats.

    ``pairs`` carries one row per candidate pair with BOOLEAN
    agreement columns ``field_cols`` and a BOOLEAN ``match_col``
    label (planted ground truth or clerical review) used to estimate
    the m/u probabilities — estimation and scoring run over the same
    relation, the standard supervised setup. Laplace smoothing
    ((c+1)/(n+2)) keeps weights finite when a field agrees on every
    labeled match. Appends ``score_col`` (BIGINT micro-nats; > 0 ⇒
    agreement pattern favors the match hypothesis)."""
    fields = list(field_cols)
    if not fields:
        raise ValueError("field_cols must be non-empty")
    is_m = F.col(match_col).cast("int")
    aggs = [
        F.sum(is_m).alias("_nm"),
        F.sum(1 - is_m).alias("_nu"),
    ]
    for i, c in enumerate(fields):
        a = F.col(c).cast("int")
        aggs.append(F.sum(is_m * a).alias(f"_cm{i}"))
        aggs.append(F.sum((1 - is_m) * a).alias(f"_cu{i}"))
    model = pairs.agg(*aggs)
    # bcast: const(1) single-row m/u counter aggregate
    scored = pairs.crossJoin(F.broadcast(model))
    terms = []
    for i, c in enumerate(fields):
        cm, cu = F.col(f"_cm{i}"), F.col(f"_cu{i}")
        nm, nu = F.col("_nm"), F.col("_nu")
        # m = (cm+1)/(nm+2), u = (cu+1)/(nu+2); weights as integer
        # cross-products so each ln sees one exact rational
        w_agree = _w_micro((cm + 1) * (nu + 2), (nm + 2) * (cu + 1))
        w_dis = _w_micro((nm + 1 - cm) * (nu + 2), (nm + 2) * (nu + 1 - cu))
        terms.append(F.when(F.col(c), w_agree).otherwise(w_dis))
    score = terms[0]
    for t in terms[1:]:
        score = score + t
    drop = ["_nm", "_nu"] + [
        f"_c{k}{i}" for i in range(len(fields)) for k in ("m", "u")
    ]
    return scored.withColumn(score_col, score).drop(*drop)
