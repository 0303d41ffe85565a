"""The sentiment kernel: deterministic lexicon scoring, score fusion, and
3-way classification.

Reference provenance (SURVEY.md §2.9, §2.7):
  U1 VADER compound     dags/sentiment_analysis_dag.py:59,72
  U2 TextBlob polarity  dags/sentiment_analysis_dag.py:73
  F8 score fusion       dags/sentiment_analysis_dag.py:75  (avg of the two)
  F9 classify ±0.1      dags/sentiment_analysis_dag.py:76-81
  F10 confidence=abs    dags/sentiment_analysis_dag.py:91
  F11 sentiment struct  dags/sentiment_analysis_dag.py:89-94

Design divergence (documented, SURVEY.md §7 risks): the reference wraps the
vaderSentiment / textblob Python libraries; neither ships in this
environment, and a row-at-a-time Python lexicon would be the slow path
anyway. This engine implements the same *shape* of computation -- two
independent lexicon analyzers fused by mean and thresholded at ±0.1 -- as
pure Spark SQL column expressions:

  vader_compound    := s / sqrt(s*s + 15)  where s = Σ(+1 pos hit, -1 neg hit)
                       -- VADER's published normalization (Hutto & Gilbert
                       2014, alpha=15) over unit valences.
  textblob_polarity := mean(lexicon weight of matched tokens), 0.0 if none
                       -- TextBlob's PatternAnalyzer averaging.

Everything is JVM-side, codegen'd, and oracle-checkable: lexicon weights are
dyadic rationals (k/16) so sums are EXACT doubles regardless of evaluation
order, and the final ops (sqrt, one division, mean) are single IEEE ops --
bit-identical between Spark and DuckDB.

A pandas-UDF variant of the same kernel lives in `pandas_kernel` to
demonstrate the Arrow-vectorized plumbing used when a real model (or the
actual VADER lib) is available; the native path is the default.
"""

from __future__ import annotations

import math

import pandas as pd

from . import dialect as D
from .text import tokenize

# Polarity lexicon. All weights are multiples of 1/16 => every partial sum is
# an exact double; cross-engine aggregation order cannot change the result.
LEXICON: dict[str, float] = {
    # general sentiment vocabulary
    "good": 0.5, "great": 0.75, "excellent": 0.9375, "best": 1.0, "nice": 0.5,
    "love": 0.75, "happy": 0.75, "awesome": 0.875, "win": 0.5, "success": 0.5,
    "improve": 0.375, "gain": 0.375, "positive": 0.5, "fresh": 0.25,
    "bad": -0.5, "terrible": -0.875, "worst": -1.0, "hate": -0.75,
    "sad": -0.75, "fail": -0.625, "error": -0.5, "crash": -0.75,
    "broken": -0.5, "bug": -0.375, "loss": -0.375, "negative": -0.5,
    "slow": -0.4375, "stale": -0.25, "dup": -0.3125,
    # domain vocabulary present in the synthetic corpus
    "fast": 0.4375, "big": 0.1875, "small": -0.1875,
}

# Extended vocabulary toward the published VADER lexicon (Hutto & Gilbert
# 2014, vader_lexicon.txt -- mean valences on a [-4, 4] scale). Weights here
# are valence/4 rounded to the nearest 1/16: dyadic, so sums stay exact in
# both engines while token coverage approaches the real library's. Values
# are stored as integer sixteenths to make exactness unmissable in review.
_EXTENDED_SIXTEENTHS: dict[str, int] = {
    # --- positive ---
    "accomplish": 8, "achievement": 10, "admire": 9, "adore": 12,
    "advantage": 7, "agree": 6, "amazing": 11, "amuse": 7, "appreciate": 8,
    "approval": 8, "attract": 6, "award": 10, "bargain": 6, "beautiful": 12,
    "benefit": 8, "better": 8, "bless": 9, "bliss": 12, "bonus": 8,
    "boost": 7, "brave": 9, "bright": 8, "brilliant": 11, "calm": 5,
    "care": 8, "celebrate": 11, "champion": 10, "charming": 10,
    "cheerful": 10, "cherish": 9, "clean": 7, "clever": 8, "comfort": 6,
    "comfortable": 7, "confident": 9, "congratulations": 12, "cool": 5,
    "courage": 9, "creative": 8, "cute": 8, "delicious": 10, "delight": 12,
    "divine": 10, "dream": 6, "eager": 6, "easy": 8, "ecstatic": 12,
    "effective": 8, "efficient": 7, "elegant": 8, "encourage": 9,
    "energetic": 8, "enjoy": 9, "enthusiastic": 11, "exceptional": 10,
    "excited": 9, "fair": 7, "faith": 8, "famous": 7, "fantastic": 10,
    "favorite": 8, "festive": 9, "fine": 3, "flawless": 12, "fortune": 9,
    "free": 9, "freedom": 12, "friendly": 9, "fun": 9, "generous": 9,
    "genius": 10, "gentle": 8, "gift": 8, "glad": 8, "glory": 10,
    "graceful": 8, "grand": 9, "grateful": 10, "greatest": 13, "handsome": 9,
    "happiness": 11, "heal": 8, "healthy": 7, "heaven": 12, "helpful": 8,
    "hero": 10, "honest": 9, "honor": 10, "hope": 8, "hopeful": 8, "hug": 8,
    "humor": 6, "ideal": 8, "impressive": 9, "incredible": 10,
    "innovative": 8, "inspire": 10, "intelligent": 10, "interesting": 7,
    "joy": 11, "kind": 10, "laugh": 10, "loyal": 9, "lucky": 10,
    "magnificent": 12, "marvelous": 12, "masterpiece": 12, "merry": 10,
    "miracle": 11, "optimistic": 9, "outstanding": 12, "paradise": 13,
    "peace": 10, "perfect": 11, "pleasant": 9, "pleased": 9, "pleasure": 11,
    "popular": 8, "powerful": 8, "pretty": 6, "productive": 8, "profit": 8,
    "progress": 7, "promising": 8, "protect": 6, "proud": 8, "reliable": 8,
    "relief": 8, "rescue": 8, "reward": 10, "rich": 10, "safe": 8,
    "satisfied": 8, "secure": 7, "smart": 8, "smile": 8, "smooth": 6,
    "special": 7, "splendid": 12, "stable": 4, "strength": 8, "strong": 9,
    "succeed": 10, "superb": 12, "superior": 9, "support": 7, "sweet": 8,
    "talent": 8, "terrific": 10, "thank": 8, "thrilled": 11, "triumph": 11,
    "trust": 9, "useful": 8, "valuable": 8, "vibrant": 9, "victory": 11,
    "warm": 6, "wealth": 9, "welcome": 8, "wise": 8, "wonder": 7,
    "wonderful": 11, "worthy": 8,
    # --- negative ---
    "abuse": -13, "afraid": -9, "angry": -9, "annoy": -8, "anxious": -8,
    "attack": -8, "awful": -8, "betray": -11, "bitter": -7, "blame": -6,
    "bore": -5, "boring": -5, "brutal": -10, "burden": -6, "chaos": -8,
    "cheat": -10, "collapse": -7, "complain": -6, "conflict": -6,
    "confuse": -5, "corrupt": -11, "costly": -4, "cruel": -11, "cry": -8,
    "damage": -8, "danger": -10, "dead": -12, "death": -12, "decline": -5,
    "defeat": -8, "delay": -4, "deny": -5, "depress": -9, "desperate": -8,
    "destroy": -10, "dirty": -7, "disappoint": -8, "disaster": -12,
    "disease": -8, "disgust": -11, "dishonest": -10, "dismal": -8,
    "disrupt": -6, "doubt": -5, "dreadful": -12, "dull": -5, "dumb": -9,
    "enemy": -10, "evil": -12, "expensive": -4, "fake": -8, "fatal": -11,
    "fear": -9, "fight": -6, "filthy": -10, "fool": -8, "fraud": -11,
    "frustrate": -8, "greed": -10, "grief": -9, "gross": -8, "guilt": -8,
    "harm": -10, "harsh": -8, "hell": -14, "horrible": -10, "horror": -11,
    "hostile": -9, "hurt": -10, "ignorant": -8, "ill": -7, "inferior": -8,
    "injury": -8, "insane": -7, "insult": -9, "jealous": -8, "kill": -12,
    "lazy": -7, "lie": -7, "lonely": -8, "lose": -7, "mad": -9, "mess": -6,
    "miserable": -11, "mistake": -7, "murder": -13, "nasty": -10,
    "neglect": -8, "nervous": -6, "offend": -8, "pain": -9, "panic": -9,
    "pathetic": -8, "poison": -10, "poor": -8, "problem": -7, "punish": -9,
    "rage": -10, "reject": -8, "risk": -4, "rotten": -9, "rude": -8,
    "ruin": -8, "scam": -8, "scare": -8, "shame": -8, "sick": -9,
    "sorrow": -10, "steal": -9, "stress": -8, "struggle": -6, "stupid": -10,
    "suffer": -10, "suspicious": -6, "threat": -8, "tired": -6,
    "tragedy": -12, "trouble": -8, "ugly": -10, "unfair": -8, "unhappy": -8,
    "upset": -8, "useless": -8, "victim": -5, "violence": -12, "war": -12,
    "waste": -7, "weak": -8, "weep": -8, "wicked": -10, "worry": -8,
    "worse": -8, "wound": -8, "wrong": -8,
}

# Round-4 growth: a further slice of the published VADER vocabulary
# (valence/4 to the nearest 1/16, same dyadic-exactness contract).
_EXTENDED_SIXTEENTHS_R4: dict[str, int] = {
    # --- positive ---
    "accept": 6, "active": 5, "admirable": 10, "adorable": 9, "adventure": 5,
    "affection": 10, "agreeable": 7, "alive": 6, "ambitious": 4, "angel": 8,
    "appeal": 6, "applaud": 8, "attractive": 8, "authentic": 6,
    "balanced": 4, "beloved": 9, "bold": 5, "capable": 6, "charismatic": 9,
    "cheer": 9, "classic": 4, "commend": 8, "compassion": 9, "competent": 6,
    "convenient": 6, "courteous": 8, "cozy": 7, "dazzle": 8, "dedicated": 7,
    "dependable": 8, "desirable": 6, "determined": 6, "devoted": 8,
    "dignity": 7, "diligent": 7, "distinguished": 7, "dynamic": 5,
    "earnest": 6, "empower": 7, "enchanting": 8, "endorse": 6,
    "engaging": 6, "enrich": 8, "epic": 6, "excel": 8, "exquisite": 10,
    "faithful": 8, "favorable": 8, "fearless": 6, "flourish": 8, "fond": 8,
    "forgive": 6, "genuine": 6, "gorgeous": 10, "gratitude": 8,
    "harmony": 8, "heartfelt": 8, "hilarious": 7, "immaculate": 8,
    "innovate": 6, "jubilant": 11, "keen": 5, "legendary": 8, "lively": 7,
    "mercy": 6, "noble": 8, "nurture": 7, "passionate": 8, "patient": 6,
    "praise": 8, "prestige": 7, "prosper": 9, "radiant": 9, "refresh": 6,
    "resilient": 6, "respect": 8, "revive": 6, "satisfying": 8, "savvy": 6,
    "serene": 8, "sincere": 8, "soothe": 7, "spectacular": 10, "thrive": 8,
    "tranquil": 7, "upbeat": 8, "uplift": 8, "virtuous": 8, "vital": 5,
    "worthwhile": 7, "zeal": 7,
    # --- negative ---
    "abandon": -8, "accuse": -6, "agony": -9, "alarm": -6, "anguish": -10,
    "apathy": -5, "arrogant": -8, "ashamed": -8, "assault": -9, "ban": -7,
    "bankrupt": -10, "beg": -4, "bleak": -6, "bully": -9, "catastrophe": -9,
    "condemn": -8, "contempt": -8, "crime": -10, "crisis": -12,
    "criticize": -6, "cursed": -8, "deceive": -8, "defect": -6,
    "degrade": -7, "demolish": -5, "despair": -12, "despise": -9,
    "devastate": -10, "disgrace": -9, "dismay": -7, "distress": -8,
    "dreary": -6, "embarrass": -6, "exhausted": -6, "exploit": -6,
    "failure": -10, "famine": -11, "foolish": -6, "forbid": -5,
    "frantic": -6, "grim": -7, "hazard": -7, "helpless": -8,
    "humiliate": -9, "hunger": -6, "idiot": -9, "illegal": -10,
    "incompetent": -8, "infect": -7, "injustice": -10, "irritate": -7,
    "jail": -7, "liar": -10, "menace": -7, "misery": -11, "mourn": -8,
    "nightmare": -10, "outrage": -9, "painful": -10, "pessimistic": -6,
    "pity": -4, "plague": -10, "prejudice": -7, "pressure": -5,
    "regret": -8, "resent": -6, "revenge": -8, "sabotage": -8,
    "savage": -7, "scandal": -8, "selfish": -8, "severe": -7, "shock": -6,
    "slaughter": -12, "strict": -4, "suicide": -13, "terror": -12,
    "toxic": -10, "tyranny": -11, "unreliable": -6, "vicious": -10,
    "vile": -11, "weary": -6, "wretched": -10,
}

assert not set(_EXTENDED_SIXTEENTHS) & set(LEXICON), "duplicate lexicon entry"
LEXICON.update({w: k / 16.0 for w, k in _EXTENDED_SIXTEENTHS.items()})
assert not set(_EXTENDED_SIXTEENTHS_R4) & set(LEXICON), "duplicate lexicon entry"
LEXICON.update({w: k / 16.0 for w, k in _EXTENDED_SIXTEENTHS_R4.items()})

POSITIVE = sorted(w for w, s in LEXICON.items() if s > 0)
NEGATIVE = sorted(w for w, s in LEXICON.items() if s < 0)

CLASSIFY_THRESHOLD = 0.1  # dags/sentiment_analysis_dag.py:76-81 / .env:42
VADER_ALPHA = 15  # normalization constant from the VADER paper


def _weight_case(d: str) -> str:
    whens = " ".join(f"when t = '{w}' then {s!r}" for w, s in sorted(LEXICON.items()))
    return f"case {whens} else 0.0 end"


def _sign_case(d: str) -> str:
    pos = D.arr_literal(d, POSITIVE)
    neg = D.arr_literal(d, NEGATIVE)
    return (
        f"case when {D.arr_contains(d, pos, 't')} then 1.0 "
        f"when {D.arr_contains(d, neg, 't')} then -1.0 else 0.0 end"
    )


def vader_compound(d: str, tokens_expr: str) -> str:
    """U1: signed-hit sum normalized by s/sqrt(s^2+alpha)."""
    s = D.arr_sum_double(d, D.arr_transform(d, tokens_expr, f"t -> {_sign_case(d)}"))
    return f"(({s}) / sqrt(({s}) * ({s}) + {VADER_ALPHA}.0))"


def textblob_polarity(d: str, tokens_expr: str) -> str:
    """U2: mean lexicon weight over matched tokens; 0.0 when nothing matches."""
    matched = D.arr_filter(d, tokens_expr, f"t -> ({_weight_case(d)}) <> 0.0")
    total = D.arr_sum_double(d, D.arr_transform(d, matched, f"t -> {_weight_case(d)}"))
    n = D.arr_size(d, matched)
    return f"(case when {n} = 0 then 0.0 else ({total}) / cast({n} as double) end)"


def avg_score(vader_col: str = "vader_compound", tb_col: str = "textblob_polarity") -> str:
    """F8: (vader + textblob) / 2 -- identical text in both dialects."""
    return f"(({vader_col} + {tb_col}) / 2.0)"


def classify(avg_col: str) -> str:
    """F9: >= 0.1 positive, <= -0.1 negative, else neutral."""
    t = CLASSIFY_THRESHOLD
    return (
        f"case when {avg_col} >= {t} then 'positive' "
        f"when {avg_col} <= -{t} then 'negative' else 'neutral' end"
    )


def confidence(avg_col: str) -> str:
    """F10: abs(mean score)."""
    return f"abs({avg_col})"


def sentiment_select_sql(d: str, text_expr: str) -> dict[str, str]:
    """The full kernel as named SQL fragments over a raw text expression.
    Keys are the output column names used engine-wide. (Inline form -- for
    hot paths prefer the layered form below, which computes each sum once.)"""
    toks = tokenize(d, text_expr)
    vc = vader_compound(d, toks)
    tb = textblob_polarity(d, toks)
    avg = f"(({vc} + {tb}) / 2.0)"
    return {
        "vader_compound": vc,
        "textblob_polarity": tb,
        "avg_score": avg,
        "overall": classify(avg),
        "confidence": confidence(avg),
    }


# --- layered kernel: each intermediate computed exactly once per row -------


def score_layers() -> list[dict[str, str]]:
    """Dialect-free score formulas over the kernel sums (_ssum, _wsum, _nm):
    the same single IEEE ops regardless of how the sums were produced (array
    fold or lexicon-join aggregate -- both exact)."""
    return [
        {
            "vader_compound": f"(_ssum / sqrt(_ssum * _ssum + {VADER_ALPHA}.0))",
            "textblob_polarity": "(case when _nm = 0 then 0.0 else _wsum / cast(_nm as double) end)",
        },
        {"avg_score": "((vader_compound + textblob_polarity) / 2.0)"},
        {"overall": classify("avg_score"), "confidence": confidence("avg_score")},
    ]


def kernel_layers(d: str, text_expr: str) -> list[dict[str, str]]:
    """The kernel as a sequence of projection layers, each referencing only
    columns defined in earlier layers -- so every intermediate (token array,
    matched subset, sums) is computed exactly once per row in both engines.
    The math is identical to the inline form: the same exact dyadic sums and
    the same single IEEE ops.

    NOTE: array-lambda form; Spark evaluates HOF lambdas interpreted, so for
    hot paths prefer the lexicon-JOIN shape (lexicon_values_sql + explode +
    broadcast join + partial agg), which stays inside whole-stage codegen and
    produces bit-identical results (exact dyadic sums are order-free).
    """
    return [
        {"_toks": tokenize(d, text_expr)},
        {"_mtoks": D.arr_filter(d, "_toks", f"t -> ({_weight_case(d)}) <> 0.0")},
        {
            "_ssum": D.arr_sum_double(d, D.arr_transform(d, "_toks", f"t -> {_sign_case(d)}")),
            "_wsum": D.arr_sum_double(d, D.arr_transform(d, "_mtoks", f"t -> {_weight_case(d)}")),
            "_nm": f"cast({D.arr_size(d, '_mtoks')} as bigint)",
        },
        *score_layers(),
    ]


def lexicon_values_sql(d: str) -> str:
    """The lexicon as an inline VALUES relation `(word, w, sgn)` -- the
    broadcast side of the join-shaped kernel. Explicit double casts: DuckDB
    parses bare decimal literals as DECIMAL, Spark as double; the cast pins
    both to the same exact dyadic doubles."""
    rows = ", ".join(
        f"('{w}', cast({s!r} as double), cast({1.0 if s > 0 else -1.0} as double))"
        for w, s in sorted(LEXICON.items())
    )
    return f"(VALUES {rows}) AS _lex(word, w, sgn)"


# ---------------------------------------------------------------------------
# Arrow-vectorized variant (U1/U2 plumbing for a real model / library).
# Same math as the SQL kernel; used by tests to prove native == pandas paths.
# ---------------------------------------------------------------------------

_TOKEN_RE = None


def _py_tokens(s: str | None) -> list[str]:
    import re

    global _TOKEN_RE
    if _TOKEN_RE is None:
        _TOKEN_RE = re.compile(r"[^a-z0-9 ]")
    if s is None:
        return []
    cleaned = _TOKEN_RE.sub(" ", s.strip().lower())
    return [t for t in cleaned.split() if t]


def _py_kernel(s: str | None) -> tuple[float, float]:
    toks = _py_tokens(s)
    signed = sum(1.0 if LEXICON.get(t, 0.0) > 0 else -1.0 if LEXICON.get(t, 0.0) < 0 else 0.0 for t in toks)
    vc = signed / math.sqrt(signed * signed + VADER_ALPHA)
    matched = [LEXICON[t] for t in toks if t in LEXICON]
    tb = (sum(matched) / len(matched)) if matched else 0.0
    return vc, tb


def real_libraries_available() -> bool:
    """True when the actual vaderSentiment + textblob packages (the libs the
    reference pins in requirements.txt:8-10) are importable in this env."""
    try:
        import textblob  # noqa: F401
        import vaderSentiment.vaderSentiment  # noqa: F401

        return True
    except ImportError:
        return False


def pandas_kernel_library(series: pd.Series) -> pd.DataFrame:
    """The SAME batch contract as `pandas_kernel`, backed by the REAL
    libraries (vaderSentiment SentimentIntensityAnalyzer.polarity_scores
    compound + TextBlob sentiment.polarity -- exactly
    dags/sentiment_analysis_dag.py:59,72-73). Raises ImportError where the
    libs are absent (this container); call sites gate on
    `real_libraries_available()` so the engine auto-upgrades to full
    reference parity the moment the packages appear in the environment."""
    from textblob import TextBlob
    from vaderSentiment.vaderSentiment import SentimentIntensityAnalyzer

    analyzer = SentimentIntensityAnalyzer()  # once per executor, not per row

    def score(s: str | None) -> tuple[float, float]:
        text = s or ""
        return (
            analyzer.polarity_scores(text)["compound"],
            TextBlob(text).sentiment.polarity,
        )

    out = series.map(score)
    return pd.DataFrame(
        {
            "vader_compound": out.map(lambda t: t[0]),
            "textblob_polarity": out.map(lambda t: t[1]),
        }
    )


def pandas_kernel(series: pd.Series) -> pd.DataFrame:
    """Batch (Arrow) kernel: text series -> DataFrame[vader_compound, textblob_polarity].

    Wrapped by a pandas_udf at the call site (operators/sentiment-enrich
    pandas path). Analyzer state (the lexicon) is module-level -- constructed
    once per executor, not per row, mirroring how a real VADER
    SentimentIntensityAnalyzer should be held (SURVEY.md §2.9 U1 note).
    """
    out = series.map(_py_kernel)
    return pd.DataFrame(
        {
            "vader_compound": out.map(lambda t: t[0]),
            "textblob_polarity": out.map(lambda t: t[1]),
        }
    )
