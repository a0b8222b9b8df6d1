"""Shared analysis-window constants.

The reference splits time into a feature window and a later label
window (``RF/randomforest_churn.scala:20``: features 2019-01-01..
2019-06-30, labels 2019-07-01..2019-09-30) plus 30/90/180-day
sub-windows derived by driver-side date math (``RF/utils.scala:34-40``).

Our star-schema testdata spans o_orderdate 1995-01-01..2001-08-01, so
we use the analogous split below. All windows are half-open
``[start, end)`` on the raw timestamp column — comparing the column
directly against timestamp literals (no ``to_date()`` wrapper around
the column) keeps the predicate pushdown- and partition-prune-friendly
at scale.
"""

# Feature (observation) window: behavior we featurize.
FEAT_START = "1995-01-01"
FEAT_END_EXCL = "1998-01-01"
# "As of" date for recency/tenure arithmetic = last day inside the window.
ASOF = "1997-12-31"

# Label window: a purchase here => not churned (label 0), else churned (1).
LABEL_START = "1998-01-01"
LABEL_END_EXCL = "1998-07-01"

# Recent sub-window (reference's 90-day slice, RF/randomforest_churn.scala:155).
RECENT_START = "1997-10-03"  # ASOF - 89 days => 90 days inclusive of ASOF

# Events stream table spans 2024-01-01..2024-01-30.
EVENTS_START = "2024-01-01"
EVENTS_END_EXCL = "2024-01-31"
