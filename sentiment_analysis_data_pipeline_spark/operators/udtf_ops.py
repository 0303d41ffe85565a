"""Python UDTF surface (SURVEY.md §2.9: the UDF/UDAF/UDTF triple).

Spark 4's Python user-defined TABLE functions: one input row -> many output
rows with their own schema, callable from SQL (`SELECT * FROM split(...)`)
and usable in LATERAL joins. The sentence splitter here is the
row-expanding shape a text pipeline needs between documents and chunks --
and deliberately one whose semantics a plain-SQL twin can mirror, so the
driver oracle can hash-check the UDTF path end-to-end (most engines' UDTF
demos are unverifiable; this one is driver-proven).

Scale notes: UDTFs run per-partition in a Python worker over Arrow batches
(the same boundary as mapInPandas); no state crosses rows here, so the
operator parallelizes with the scan and needs no shuffle at all.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

# No lookbehind (kept portable: RE2-based oracles can't do lookbehind);
# the delimiter run is consumed, empties are dropped on both sides.
# The whitespace class is written out EXPLICITLY (not \s) because Python's
# re \s is Unicode-aware while the RE2-based oracle's \s is ASCII-only --
# with \s a NBSP/ideographic space at a sentence edge would silently
# diverge between the engines. Same reason strip() below is restricted to
# the identical ASCII set instead of Unicode str.strip().
ASCII_WS = " \t\n\r\f\v"
SENTENCE_SPLIT_PATTERN = r"[.!?]+[ \t\n\r\f\v]+"


# useArrow=True EXPLICITLY: @udtf resolves the arrow decision at
# decoration/creation time, not plan time, so the session conf
# (spark.sql.execution.pythonUDTF.arrow.enabled) set later cannot switch
# an already-created UDTF -- measured: conf-only left the plan on
# row-at-a-time BatchEvalPythonUDTF, the one hard tools/plan_lint.py
# violation in the registry; with the explicit flag the plan runs
# ArrowEvalPythonUDTF and the ASCII-exact parity golden still holds.
@udtf(returnType="sentence_idx bigint, sentence string", useArrow=True)
class SentenceSplit:
    """(text) -> one row per sentence, with its 0-based index."""

    def eval(self, text: str | None):
        if text is None:
            return
        idx = 0
        for part in re.split(SENTENCE_SPLIT_PATTERN, text):
            part = part.strip(ASCII_WS)
            if part:
                yield (idx, part)
                idx += 1


def register(spark) -> None:
    spark.udtf.register("sentence_split", SentenceSplit)
