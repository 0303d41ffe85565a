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

  vader_compound    := s2 / sqrt(s2*s2 + 15)  where s = Σ(f_i * ±1 per hit)
                       and s2 = s ± punctuation emphasis (in s's direction)
                       -- VADER's published normalization (Hutto & Gilbert
                       2014, alpha=15) over unit valences, each scaled by
                       the product f_i of the token's contextual factors:
                       preceding-token modifiers (negators -0.75,
                       intensifiers 1.25, dampeners 0.75 -- round 5,
                       mirroring N_SCALAR / BOOSTER_DICT), and (round 6)
                       "kind of"/"sort of" bigram dampeners, ALL-CAPS
                       emphasis x1.25 under a caps differential, and the
                       but-clause re-weighting x0.5/x1.5. Punctuation
                       emphasis ("!" x0.25 capped at 4; "?" 0.1875 each at
                       2-3, 0.9375 above) amplifies the VADER sum only.
                       Round 6b extends the context to the published
                       3-TOKEN window: negators reach through up to two
                       intervening words, boosters at distance 2/3 damp
                       by 0.9375/0.875 (dyadic stand-ins for 0.95/0.9),
                       and the published "never so|this" (x1.25) and
                       "without doubt" (no negation) overrides apply.
                       Round 6c: a booster spelled ALL-CAPS under the
                       differential doubles its delta (published C_INCR
                       on the booster scalar). Round 7 completes the
                       published-mechanics inventory with the
                       SENTIMENT_LADEN_IDIOMS / SPECIAL_CASES tables:
                       an idiom hit REPLACES its constituents' valences
                       (consumed-position bookkeeping) and contributes
                       its own dyadic valence once, at its end position,
                       but-clause re-weighted (IDIOM_SIXTEENTHS block).
  textblob_polarity := Σ(f_i * weight_i) / n_matched, 0.0 if none
                       -- TextBlob's PatternAnalyzer averaging, with the
                       same modifier scaling (Pattern negates at -0.5; the
                       shared -0.75 keeps one factor set for both scores).

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

# Round-5 growth: a further slice of the published VADER vocabulary
# (valence/4 to the nearest 1/16, same dyadic-exactness contract).
_EXTENDED_SIXTEENTHS_R5: dict[str, int] = {
    # --- positive ---
    "ability": 5, "abundance": 6, "acclaim": 7, "accolade": 8,
    "affordable": 6, "agile": 5, "altruistic": 8, "assure": 6,
    "astonishing": 7, "attentive": 7, "auspicious": 7, "avid": 5,
    "backing": 4, "beneficial": 8, "benevolent": 9, "blossom": 7,
    "breakthrough": 8, "bullish": 6, "buoyant": 7, "capability": 5,
    "certainty": 5, "charitable": 8, "cherished": 9, "comedy": 5,
    "commitment": 6, "community": 4, "competitive": 4, "confidence": 9,
    "consistent": 4, "constructive": 6, "content": 6, "courageous": 9,
    "credible": 6, "darling": 8, "decent": 6, "defend": 4, "delightful": 11,
    "deserving": 6, "desire": 5, "develop": 4, "devotion": 8, "discovery": 6,
    "eagerly": 6, "earn": 5, "ease": 6, "educate": 6, "effortless": 7,
    "embrace": 6, "eminent": 6, "empathy": 7, "endear": 7, "endurance": 5,
    "enhance": 7, "enlighten": 8, "entertain": 7, "esteem": 8, "ethical": 7,
    "euphoric": 13, "excellence": 11, "exciting": 9, "exemplary": 9,
    "expand": 4, "fabulous": 10, "fairness": 8, "fame": 7, "fascinating": 9,
    "feat": 6, "fertile": 5, "fidelity": 6, "finest": 10, "fitting": 5,
    "flatter": 6, "fluent": 6, "fortunate": 9, "forward": 4, "foster": 6,
    "fulfill": 8, "funny": 8, "generosity": 9, "glee": 10, "glow": 7,
    "goodness": 10, "goodwill": 9, "gracious": 9, "gratify": 8,
    "greet": 5, "growth": 6, "guarantee": 6, "guidance": 6, "happier": 10,
    "harmless": 5, "heartwarming": 10, "helper": 6, "heroic": 9,
    "highlight": 5, "holiday": 6, "hopefully": 6, "hospitable": 8,
    "humane": 8, "hurrah": 10, "immune": 4, "importance": 5, "improved": 8,
    "improvement": 8, "incentive": 6, "independence": 6, "inspiring": 10,
    "integrity": 8, "intelligence": 9, "invincible": 8, "jolly": 9,
    "jovial": 9, "joyful": 12, "justice": 8, "kindness": 10, "landmark": 5,
    "liberty": 8, "lifesaver": 10, "likable": 7, "luck": 8, "luxury": 8,
    "magical": 8, "mastery": 8, "mature": 6, "memorable": 7, "merit": 6,
    "mighty": 7, "motivate": 7, "nicely": 7, "nourish": 7, "openness": 6,
    "opportunity": 6, "overcome": 6, "passion": 8, "peaceful": 10,
    "perfection": 11, "perseverance": 7, "playful": 8, "plentiful": 7,
    "positively": 9, "precious": 8, "prevail": 6, "pride": 7, "privilege": 7,
    "prodigy": 8, "proficient": 7, "prominent": 6, "prompt": 4,
    "prosperity": 10, "purity": 7, "quality": 5, "recommend": 7,
    "recover": 6, "refine": 5, "rejoice": 11, "remarkable": 9, "renew": 6,
    "renown": 7, "resolve": 5, "restore": 5, "revere": 8, "robust": 6,
    "sacred": 7, "salvation": 8, "satisfaction": 9, "savior": 9,
    "securely": 6, "sensational": 9, "sensible": 6, "serenity": 9,
    "sharp": 4, "shine": 7, "skill": 6, "skillful": 8, "soulmate": 10,
    "sparkle": 7, "spirited": 7, "stellar": 9, "stunning": 9, "sublime": 9,
    "sufficient": 4, "sunshine": 7, "supporting": 6, "supreme": 9,
    "surpass": 7, "sympathetic": 6, "tenacious": 5, "tender": 7,
    "thankful": 9, "thoughtful": 8, "tolerant": 6, "top": 6, "tranquility": 8,
    "treasure": 9, "tribute": 7, "truthful": 8, "unity": 7, "upgrade": 6,
    "uplifting": 9, "usefulness": 6, "validate": 5, "vigilant": 4,
    "vigorous": 6, "visionary": 8, "vivacious": 8, "warmth": 8, "willing": 4,
    "winner": 11, "winning": 11, "wisdom": 9, "worship": 7, "youthful": 6,
    # --- negative ---
    "abduct": -9, "abhor": -10, "abolish": -5, "absurd": -6, "aching": -7,
    "addiction": -8, "adverse": -7, "adversity": -7, "aggravate": -8,
    "aggression": -9, "alienate": -7, "allegation": -5, "ambush": -8,
    "animosity": -8, "annihilate": -10, "antagonize": -7, "apprehensive": -5,
    "argument": -5, "arrest": -7, "arson": -10, "atrocious": -11,
    "atrocity": -11, "avalanche": -5, "avoid": -5, "backlash": -6,
    "banish": -7, "barbaric": -10, "betrayal": -11, "bias": -5,
    "blackmail": -10, "bloodshed": -11, "blunder": -7, "bomb": -9,
    "breakdown": -7, "bribe": -8, "broke": -6, "brutality": -11,
    "cancer": -11, "casualty": -9, "censor": -6, "clash": -6,
    "collision": -6, "complaint": -6, "conspiracy": -7, "contaminate": -8,
    "controversy": -6, "corruption": -11, "crash": 0, "criminal": -9,
    "cripple": -9, "critic": -4, "cruelty": -11, "cutback": -5,
    "deadlock": -5, "deadly": -11, "deceit": -9, "deception": -9,
    "defeated": -9, "deficit": -6, "degradation": -7, "demise": -8,
    "demolition": -5, "denounce": -7, "deprive": -7, "despicable": -10,
    "destruction": -10, "deteriorate": -7, "detrimental": -8,
    "devastating": -11, "dictator": -9, "disadvantage": -7,
    "disappointment": -9, "discord": -6, "discriminate": -8, "dishonor": -9,
    "dismiss": -5, "disorder": -6, "dispute": -5, "disturbing": -8,
    "divorce": -7, "downfall": -8, "downturn": -6, "drought": -7,
    "drown": -9, "embezzle": -9, "emergency": -7, "epidemic": -9,
    "eradicate": -5, "erode": -5, "erroneous": -6, "escalate": -5,
    "eviction": -8, "exclude": -5, "excruciating": -11, "execute": -7,
    "explosion": -7, "extinct": -7, "extort": -9, "fatality": -10,
    "fiasco": -8, "flaw": -6, "flee": -6, "forgery": -8, "frightening": -9,
    "fugitive": -6, "futile": -7, "gloom": -8, "grievance": -6,
    "gruesome": -10, "hardship": -8, "hatred": -12, "havoc": -8,
    "hazardous": -8, "heartbreak": -10, "hijack": -9, "homeless": -8,
    "hopeless": -10, "hostage": -8, "hostility": -9, "humiliation": -10,
    "hysteria": -7, "impair": -6, "imprison": -8, "inadequate": -7,
    "incident": -4, "indict": -7, "inept": -7, "infestation": -8,
    "inflation": -5, "insolvent": -7, "instability": -6, "insufficient": -6,
    "intimidate": -8, "invasion": -8, "jeopardy": -8, "kidnap": -10,
    "lawsuit": -5, "layoff": -8, "lethal": -9, "loot": -8, "malice": -9,
    "malicious": -9, "manipulate": -6, "massacre": -12, "mayhem": -9,
    "meltdown": -7, "mishap": -6, "mislead": -7, "mob": -5, "mockery": -7,
    "moody": -5, "mourning": -9, "negligence": -8, "obstacle": -5,
    "obstruct": -6, "offensive": -8, "oppress": -9, "outbreak": -7,
    "overdose": -8, "overload": -5, "paralyze": -8, "penalty": -6,
    "peril": -8, "persecute": -9, "pollution": -7, "poverty": -9,
    "predator": -7, "prosecute": -7, "protest": -5, "provoke": -6,
    "quarrel": -6, "ransom": -8, "recession": -8, "reckless": -7,
    "refuse": -5, "remorse": -6, "resign": -5, "retaliate": -7, "riot": -8,
    "rob": -9, "rubble": -5, "rupture": -6, "ruthless": -9, "sanction": -5,
    "scarcity": -6, "scorn": -8, "scream": -6, "setback": -7, "shatter": -7,
    "shortage": -6, "shutdown": -6, "slander": -9, "slump": -6, "smash": -5,
    "smuggle": -7, "sorrowful": -10, "stagnant": -5, "starve": -9,
    "strain": -5, "stranded": -6, "strife": -7, "subpoena": -5,
    "suppress": -6, "suspect": -5, "tarnish": -6, "tension": -6,
    "terrorism": -13, "theft": -9, "threaten": -9, "torment": -10,
    "torture": -12, "toxin": -8, "tragic": -11, "traitor": -10,
    "trauma": -10, "treason": -10, "turmoil": -8, "unacceptable": -8,
    "unemployment": -8, "unethical": -9, "unrest": -7, "unsafe": -8,
    "unstable": -6, "uprising": -6, "vandalism": -8, "vengeance": -8,
    "venom": -8, "vulnerable": -6, "warfare": -10, "worthless": -9,
    "wreck": -8, "wrath": -9,
}
# "crash" already in the base lexicon -- the R5 slice must not shadow it
_EXTENDED_SIXTEENTHS_R5.pop("crash")
# NOT included from published VADER: "value" (+1.4 there) -- it is the
# synthetic corpus's ubiquitous domain token (950 hits / 500 docs at
# sf0.001, never in a sentiment sense), and scoring it would swamp the
# flagship distribution with non-sentiment usage; same rationale as the
# base lexicon's domain-vocabulary adjustments.

assert not set(_EXTENDED_SIXTEENTHS) & set(LEXICON), "duplicate lexicon entry"
LEXICON.update({w: k / 16.0 for w, k in _EXTENDED_SIXTEENTHS.items()})
assert not set(_EXTENDED_SIXTEENTHS_R4) & set(LEXICON), "duplicate lexicon entry"
LEXICON.update({w: k / 16.0 for w, k in _EXTENDED_SIXTEENTHS_R4.items()})
assert not set(_EXTENDED_SIXTEENTHS_R5) & set(LEXICON), "duplicate lexicon entry"
LEXICON.update({w: k / 16.0 for w, k in _EXTENDED_SIXTEENTHS_R5.items()})

POSITIVE = sorted(w for w, s in LEXICON.items() if s > 0)
NEGATIVE = sorted(w for w, s in LEXICON.items() if s < 0)

CLASSIFY_THRESHOLD = 0.1  # dags/sentiment_analysis_dag.py:76-81 / .env:42
VADER_ALPHA = 15  # normalization constant from the VADER paper

# --- contextual modifiers (round 5): negation + boosters ------------------
#
# VADER's published algorithm modifies a sentiment word's valence by the
# words immediately preceding it: negators flip-and-dampen (N_SCALAR=-0.74),
# intensifiers add/remove ~0.293 in the valence's direction (B_INCR/B_DECR).
# The kernel applies the same mechanics with ONE preceding token of context
# and dyadic factors, so every sum stays exact and order-free in both
# engines: a matched token's contribution (both the signed unit for the
# VADER sum and the weight for the TextBlob mean) is scaled by
#   -0.75  when preceded by a negator   (vs published -0.74)
#    1.25  when preceded by an intensifier (vs published +0.293 additive)
#    0.75  when preceded by a dampener     (vs published -0.293 additive)
# Word lists are from VADER's published NEGATE / BOOSTER_DICT (contraction
# stems appear as their tokenized forms: the tokenizer maps "don't" ->
# ["don", "t"], so the intervening "t" token is itself a negator -- that is
# what immediately precedes the sentiment word).
NEGATE: tuple[str, ...] = (
    "aint", "cannot", "cant", "darent", "despite", "dont", "hardly",
    "havent", "isnt", "lack", "lacking", "lacks", "neither", "never", "no",
    "none", "nope", "nor", "not", "nothing", "nowhere", "rarely",
    "scarcely", "seldom", "shouldnt", "t", "uhuh", "wasnt", "werent",
    "without", "wont", "wouldnt",
)
BOOST_INCR: tuple[str, ...] = (
    "absolutely", "amazingly", "awfully", "completely", "considerably",
    "decidedly", "deeply", "enormously", "entirely", "especially",
    "exceptionally", "extremely", "greatly", "highly", "hugely",
    "incredibly", "intensely", "majorly", "purely", "quite", "really",
    "remarkably", "so", "substantially", "thoroughly", "totally",
    "tremendously", "unbelievably", "unusually", "utterly", "very",
)
BOOST_DECR: tuple[str, ...] = (
    # "kindof"/"sortof" are the joined single-token forms of the published
    # "kind of"/"sort of" boosters (round 6); the two-token forms are
    # handled by BOOST_BIGRAMS below.
    "barely", "kinda", "kindof", "marginally", "occasionally", "partly",
    "slightly", "somewhat", "sorta", "sortof",
)
NEG_FACTOR = -0.75  # dyadic stand-in for VADER's N_SCALAR -0.74
INCR_FACTOR = 1.25
DECR_FACTOR = 0.75
MODIFIER_FACTORS: dict[str, float] = {
    **{w: NEG_FACTOR for w in NEGATE},
    **{w: INCR_FACTOR for w in BOOST_INCR},
    **{w: DECR_FACTOR for w in BOOST_DECR},
}
assert not set(MODIFIER_FACTORS) & set(LEXICON), "modifier/lexicon overlap"

# --- round-6 mechanics: the remaining published-VADER behaviors that are
# dyadic-weight-expressible (VERDICT r5 missing item 1 / next-round item 4).
# Each mirrors a mechanic of Hutto & Gilbert 2014's published algorithm with
# exact dyadic constants so cross-engine sums stay order-free:
#
#   BOOST_BIGRAMS      VADER's multi-token boosters "kind of"/"sort of"
#                      (BOOSTER_DICT): when the TWO tokens before a
#                      sentiment word are such a pair, the dampener factor
#                      applies (takes precedence over the single-prev rule
#                      -- "of" alone is no modifier anyway).
#   CAPS_FACTOR        ALL-CAPS emphasis (C_INCR=0.733 added to |valence|):
#                      multiplicative 1.25 on a token spelled ALL-CAPS when
#                      the document mixes cased styles (VADER's
#                      allcap_differential: some but not all tokens upper).
#   BUT_BEFORE/AFTER   the published _but_check: contributions before the
#                      first "but" x0.5, after it x1.5.
#   EP_* / QM_*        punctuation emphasis on the compound sum: 0.25 per
#                      "!" capped at 4 (published 0.292); "?" count 2-3 ->
#                      0.1875 each, >3 -> 0.9375 total (published
#                      0.18/0.96). Applied in the direction of the sum,
#                      VADER-sum only (TextBlob's Pattern has no analog).
BOOST_BIGRAMS: tuple[tuple[str, str], ...] = (("kind", "of"), ("sort", "of"))
BIGRAM_FACTOR = DECR_FACTOR
CAPS_FACTOR = 1.25
BUT_BEFORE = 0.5
BUT_AFTER = 1.5
EP_PER_EXCL = 0.25
EP_MAX_EXCL = 4
QM_PER = 0.1875
QM_MAX = 0.9375

# --- round-6b: the published 3-token context window -----------------------
#
# VADER inspects the THREE words preceding a sentiment token, not one:
# boosters at distance 2/3 contribute their amount damped x0.95/x0.9
# (dyadic stand-ins 0.9375/0.875 here, same policy as -0.75 for -0.74),
# a negator at ANY of the three positions flips-and-dampens, and two
# published special cases override negation: "never so|this <word>" turns
# the negation into a x1.25 intensifier, and "without doubt <word>" is NOT
# a negation. Multiplicative-mirror composition: each position contributes
# an independent dyadic factor (booster 1 +- delta*damp, negation -0.75 or
# its override), all multiplied -- exact, order-free sums preserved.
BOOST_DELTA = 0.25          # booster amount at distance 1 (x1.25 / x0.75)
B2_DAMP = 0.9375            # published 0.95 (dyadic stand-in)
B3_DAMP = 0.875             # published 0.9
NEVER_INTENSIFY = 1.25      # published: "never so/this" re-weights x1.25
NEVER_FOLLOWERS = ("so", "this")
WITHOUT_DOUBT = ("without", "doubt")  # published: not a negation

# --- round-7: sentiment-laden idioms (the last published VADER mechanic) ---
#
# VADER's published idiom tables (SENTIMENT_LADEN_IDIOMS and the
# SPECIAL_CASES checked by _special_idioms_check in vaderSentiment.py): a
# multi-word idiom hit REPLACES its constituents' valences -- consumed
# -position bookkeeping, not a per-token factor. Mechanics mirrored here:
#   - an idiom occurrence contributes its own valence once, at its END
#     position (published scale /4 to the nearest 1/16 -- dyadic, same
#     contract as the lexicon);
#   - every token position covered by an occurrence is CONSUMED: its own
#     lexicon valence (and modifier context) is suppressed ("bad ass" must
#     not also count "bad"; "kiss of death" must not also count "death");
#   - the but-clause re-weighting applies to the idiom's contribution
#     (VADER's _but_check runs over the full sentiments list, idioms
#     included); the 3-token modifier window and caps emphasis do not
#     (idiom matching in the published code is over lowercased words, and
#     this engine does not mirror the booster-before-idiom lookback --
#     documented divergence, like -0.75 for N_SCALAR).
# "bus stop" (published valence 0) consumes its constituents but adds no
# contribution and does not count toward the TextBlob match count.
# Values are integer sixteenths of the [-1, 1] weight (published valence/4).
IDIOM_SIXTEENTHS: dict[str, int] = {
    # SENTIMENT_LADEN_IDIOMS
    "cut the mustard": 8, "hand to mouth": -8, "back handed": -8,
    "blow smoke": -8, "blowing smoke": -8, "upper hand": 4,
    "break a leg": 8, "cooking with gas": 8, "in the black": 8,
    "in the red": -8, "on the ball": 8, "under the weather": -8,
    # SPECIAL_CASES ("badass" is single-token -> lexicon territory, skipped)
    "the shit": 12, "the bomb": 12, "bad ass": 6, "bus stop": 0,
    "yeah right": -8, "kiss of death": -6, "to die for": 12,
    "beating heart": 12, "broken heart": -12,
}
# (tokens..., weight) split by arity -- the kernel matches 2- and 3-gram
# ends against the prev/prev2 context it already carries per token.
IDIOMS_2: tuple[tuple[str, str, float], ...] = tuple(
    (*p.split(), k / 16.0)
    for p, k in sorted(IDIOM_SIXTEENTHS.items())
    if len(p.split()) == 2
)
IDIOMS_3: tuple[tuple[str, str, str, float], ...] = tuple(
    (*p.split(), k / 16.0)
    for p, k in sorted(IDIOM_SIXTEENTHS.items())
    if len(p.split()) == 3
)
assert len(IDIOMS_2) + len(IDIOMS_3) == len(IDIOM_SIXTEENTHS)


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


# --- layered kernel: each intermediate computed exactly once per row -------


def score_layers() -> list[dict[str, str]]:
    """Dialect-free score formulas over the kernel sums (_ssum, _wsum, _nm)
    and the per-doc punctuation-emphasis amplifier (_pe, round 6): the same
    single IEEE ops regardless of how the sums were produced (array fold or
    lexicon-join aggregate -- both exact). _s2 is the published
    score_valence step: the emphasis is added IN THE DIRECTION of the sum,
    and a zero sum stays zero (no sentiment to amplify)."""
    return [
        {
            "_s2": (
                "(case when _ssum > 0 then _ssum + _pe "
                "when _ssum < 0 then _ssum - _pe else _ssum end)"
            ),
        },
        {
            "vader_compound": f"(_s2 / sqrt(_s2 * _s2 + {VADER_ALPHA}.0))",
            "textblob_polarity": "(case when _nm = 0 then 0.0 else _wsum / cast(_nm as double) end)",
        },
        {"avg_score": "((vader_compound + textblob_polarity) / 2.0)"},
        {"overall": classify("avg_score"), "confidence": confidence("avg_score")},
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


def modifier_values_sql(d: str, alias: str = "_mod") -> str:
    """The contextual modifiers as an inline VALUES relation
    `(mword, delta, neg)` -- the broadcast side the kernel LEFT-joins at
    EACH of the three preceding-token positions (round 6b). `delta` is the
    booster amount (+0.25 intensifier / -0.25 dampener, 0 for negators --
    distance damping is applied at the join site, where the position is
    known); `neg` flags negators. Unmatched prev tokens coalesce to
    (0, 0) -- factor 1."""
    rows = ", ".join(
        f"('{w}', cast({(0.0 if f < 0 else f - 1.0)!r} as double), {1 if f < 0 else 0})"
        for w, f in sorted(MODIFIER_FACTORS.items())
    )
    return f"(VALUES {rows}) AS {alias}(mword, delta, neg)"


def prev_tokens_sql(d: str, toks_col: str = "_toks") -> str:
    """Expression producing the PREV-token array aligned with `toks_col`:
    element i holds token i-1 (element 0 is NULL). Zipped/unnested in
    lockstep with the token array, it gives each exploded token its one
    -token left context without a window shuffle -- the whole pairing stays
    inside the per-row projection, so the kernel keeps its single
    doc-id partial-agg shuffle at any scale."""
    if d == D.SPARK:
        return (
            f"concat(array(cast(null as string)), "
            f"case when size({toks_col}) > 1 "
            f"then slice({toks_col}, 1, size({toks_col}) - 1) "
            f"else array() end)"
        )
    return (
        f"list_prepend(cast(null as varchar), "
        f"case when len({toks_col}) > 1 "
        f"then list_slice({toks_col}, 1, len({toks_col}) - 1) "
        f"else [] end)"
    )


def shifted_tokens_sql(d: str, toks_col: str, k: int) -> str:
    """Array aligned with `toks_col` whose element i holds token i-k
    (first k elements NULL). Built by prepending k NULLs and slicing back
    to the original length, so the array is EXACTLY as long as the token
    array at every size -- the k-token left context arrays the kernel
    explodes in lockstep."""
    if d == D.SPARK:
        nulls = ", ".join(["cast(null as string)"] * k)
        return f"slice(concat(array({nulls}), {toks_col}), 1, size({toks_col}))"
    inner = toks_col
    for _ in range(k):
        inner = f"list_prepend(cast(null as varchar), {inner})"
    return f"list_slice({inner}, 1, len({toks_col}))"


def prev2_tokens_sql(d: str, toks_col: str = "_toks") -> str:
    """Token i-2 aligned array (the BOOST_BIGRAMS / negation-window context)."""
    return shifted_tokens_sql(d, toks_col, 2)


def prev3_tokens_sql(d: str, toks_col: str = "_toks") -> str:
    """Token i-3 aligned array (the outer edge of the published window)."""
    return shifted_tokens_sql(d, toks_col, 3)


def shifted_fwd_tokens_sql(d: str, toks_col: str, k: int) -> str:
    """Forward twin of shifted_tokens_sql: element i holds token i+k (last k
    elements NULL). The right-context arrays the idiom consumed-position
    check explodes in lockstep (a lexicon word must know whether an idiom
    occurrence STARTING at or just before it consumes its position)."""
    if d == D.SPARK:
        nulls = ", ".join(["cast(null as string)"] * k)
        return (
            f"slice(concat(case when size({toks_col}) > {k} "
            f"then slice({toks_col}, {k + 1}, size({toks_col}) - {k}) "
            f"else array() end, array({nulls})), 1, size({toks_col}))"
        )
    nulls = ", ".join(["cast(null as varchar)"] * k)
    return (
        f"list_slice(list_concat(case when len({toks_col}) > {k} "
        f"then list_slice({toks_col}, {k + 1}, len({toks_col})) "
        f"else [] end, [{nulls}]), 1, len({toks_col}))"
    )


def but_factor_sql(i: str = "i", bi: str = "bi") -> str:
    """The published _but_check re-weighting for a contribution at 1-based
    position `i` given the first-'but' index `bi` (0 = no 'but')."""
    return (
        f"(case when {bi} > 0 and {i} < {bi} then {BUT_BEFORE!r} "
        f"when {bi} > 0 and {i} > {bi} then {BUT_AFTER!r} else 1.0 end)"
    )


def idiom_weight_sql(t: str = "t", prev: str = "prev", prev2: str = "prev2") -> str:
    """CASE returning the idiom weight (dyadic double) when a NONZERO-valence
    idiom ENDS at this token, else NULL. 3-grams first (no published 2-gram
    is a suffix of a 3-gram, but the precedence is still the safe one);
    each conjunct tests the END token first so the chain fails fast on the
    overwhelmingly-common non-end tokens."""
    arms = []
    for a, b, c, v in IDIOMS_3:
        if v != 0.0:
            arms.append(
                f"when {t} = '{c}' and {prev} = '{b}' and {prev2} = '{a}' "
                f"then cast({v!r} as double)"
            )
    for a, b, v in IDIOMS_2:
        if v != 0.0:
            arms.append(
                f"when {t} = '{b}' and {prev} = '{a}' then cast({v!r} as double)"
            )
    return f"(case {' '.join(arms)} else cast(null as double) end)"


def idiom_consumed_sql(
    t: str = "t",
    prev: str = "prev",
    prev2: str = "prev2",
    nx1: str = "nx1",
    nx2: str = "nx2",
) -> str:
    """TRUE when this token position lies INSIDE any idiom occurrence
    (including zero-valence ones like 'bus stop'): an occurrence ends here,
    at the next position, or (3-grams) two positions ahead. Consumed
    positions contribute nothing of their own -- the idiom's single
    end-position contribution replaces them. NULL-safe (coalesced false) so
    a doc-edge NULL context can never silently drop a real lexicon match."""
    ors = []
    for a, b, c, _ in IDIOMS_3:
        ors.append(f"({t} = '{c}' and {prev} = '{b}' and {prev2} = '{a}')")
        ors.append(f"({t} = '{b}' and {prev} = '{a}' and {nx1} = '{c}')")
        ors.append(f"({t} = '{a}' and {nx1} = '{b}' and {nx2} = '{c}')")
    for a, b, _ in IDIOMS_2:
        ors.append(f"({t} = '{b}' and {prev} = '{a}')")
        ors.append(f"({t} = '{a}' and {nx1} = '{b}')")
    return f"coalesce(({' OR '.join(ors)}), false)"


def shifted_flags_sql(d: str, flags_col: str, k: int) -> str:
    """Boolean twin of shifted_tokens_sql: element i holds flag i-k (first
    k elements NULL -> coalesced false at the explode site). Used for the
    caps flags of the three window positions (caps-boosted boosters)."""
    if d == D.SPARK:
        nulls = ", ".join(["cast(null as boolean)"] * k)
        return f"slice(concat(array({nulls}), {flags_col}), 1, size({flags_col}))"
    inner = flags_col
    for _ in range(k):
        inner = f"list_prepend(cast(null as boolean), {inner})"
    return f"list_slice({inner}, 1, len({flags_col}))"


def caps_flags_sql(d: str, text_expr: str) -> str:
    """Boolean array aligned with tokenize(text): element i is true when
    token i was spelled ALL-CAPS in the raw text (>= 1 letter, every letter
    uppercase -- Python str.isupper semantics, digits allowed). Alignment
    with the lowercased token array is structural: the cleaning regex and
    the whitespace split commute with lower(), so positions match."""
    cleaned = D.regexp_replace_all(d, f"trim({text_expr})", "[^a-zA-Z0-9 ]", " ")
    arr = D.split_ws(d, f"trim({cleaned})")
    nonempty = D.arr_filter(d, arr, "t -> t <> ''")
    pat = "^[A-Z0-9]*[A-Z][A-Z0-9]*$"
    if d == D.SPARK:
        return D.arr_transform(d, nonempty, f"t -> t rlike '{pat}'")
    return D.arr_transform(d, nonempty, f"t -> regexp_matches(t, '{pat}')")


def cap_differential_sql(caps_col: str, toks_col: str, d: str) -> str:
    """VADER's allcap_differential over the flag array: true when SOME but
    not ALL tokens are ALL-CAPS (0 < n_caps < n_tokens)."""
    ncaps = D.arr_size(d, D.arr_filter(d, caps_col, "c -> c"))
    return f"({ncaps} > 0 AND {ncaps} < {D.arr_size(d, toks_col)})"


def but_index_sql(d: str, toks_col: str = "_toks") -> str:
    """1-based index of the first 'but' token; 0 when absent (the pivot for
    the published _but_check re-weighting)."""
    if d == D.SPARK:
        return f"array_position({toks_col}, 'but')"
    return f"coalesce(list_position({toks_col}, 'but'), 0)"


def punct_emphasis_sql(d: str, text_expr: str) -> str:
    """The published punctuation-emphasis amplifier as one exact dyadic
    double: !-count (capped at 4) x 0.25, plus ?-emphasis (2-3 -> 0.1875
    each, >3 -> 0.9375). Added to the VADER sum in its direction by
    score_layers' _s2 stage."""
    ep = D.regexp_count(d, text_expr, "!")
    qm = D.regexp_count(d, text_expr, "\\?")
    return (
        f"(cast(least({ep}, {EP_MAX_EXCL}) as double) * {EP_PER_EXCL!r}"
        f" + case when {qm} > 3 then {QM_MAX!r}"
        f" when {qm} > 1 then cast({qm} as double) * {QM_PER!r}"
        f" else 0.0 end)"
    )


def token_factor_sql(
    prev: str = "prev", prev2: str = "prev2", prev3: str = "prev3",
    capsf: str = "capsf", cap_diff: str = "cap_diff",
    i: str = "i", bi: str = "bi",
    d1: str = "_m1.delta", n1: str = "_m1.neg",
    d2: str = "_m2.delta", n2: str = "_m2.neg",
    d3: str = "_m3.delta", n3: str = "_m3.neg",
    capsp1: str = "capsp1", capsp2: str = "capsp2", capsp3: str = "capsp3",
) -> str:
    """Per-matched-token scale factor combining every contextual mechanic
    over the published 3-token window (round 6b): per-position booster
    factors (bigram dampeners override position 1; distance damping at
    2/3), per-position negation with the published "never so|this" /
    "without doubt" overrides, ALL-CAPS emphasis, and the but-clause
    re-weighting. A product of dyadic factors -- exact in both engines.
    Column references are parameters so the SQL template and the DataFrame
    pipeline share one formula; d*/n* are the delta/neg columns of the
    three modifier joins (NULL when the position has no modifier)."""
    never = ", ".join(f"'{w}'" for w in NEVER_FOLLOWERS)
    wo, doubt = WITHOUT_DOUBT
    bigram = " OR ".join(
        f"({prev2} = '{a}' AND {prev} = '{b}')" for a, b in BOOST_BIGRAMS
    )
    # a booster spelled ALL-CAPS under a caps differential doubles its
    # delta (published: C_INCR added to the booster scalar; dyadic mirror:
    # 0.25 -> 0.5) -- round 6c, the caps-boosted-booster mechanic
    cm1 = f"(case when {capsp1} AND {cap_diff} then 2.0 else 1.0 end)"
    cm2 = f"(case when {capsp2} AND {cap_diff} then 2.0 else 1.0 end)"
    cm3 = f"(case when {capsp3} AND {cap_diff} then 2.0 else 1.0 end)"
    b1 = (
        f"case when {bigram} then {BIGRAM_FACTOR!r} "
        f"else 1.0 + coalesce({d1}, 0.0) * {cm1} end"
    )
    b2 = f"(1.0 + coalesce({d2}, 0.0) * {B2_DAMP!r} * {cm2})"
    b3 = f"(1.0 + coalesce({d3}, 0.0) * {B3_DAMP!r} * {cm3})"
    g1 = f"case when coalesce({n1}, 0) = 1 then {NEG_FACTOR!r} else 1.0 end"
    g2 = (
        f"case when {prev2} = 'never' and {prev} in ({never}) then {NEVER_INTENSIFY!r} "
        f"when {prev2} = '{wo}' and {prev} = '{doubt}' then 1.0 "
        f"when coalesce({n2}, 0) = 1 then {NEG_FACTOR!r} else 1.0 end"
    )
    g3 = (
        f"case when {prev3} = 'never' and ({prev2} in ({never}) or {prev} in ({never})) "
        f"then {NEVER_INTENSIFY!r} "
        f"when {prev3} = '{wo}' and ({prev2} = '{doubt}' or {prev} = '{doubt}') then 1.0 "
        f"when coalesce({n3}, 0) = 1 then {NEG_FACTOR!r} else 1.0 end"
    )
    caps = f"case when {capsf} AND {cap_diff} then {CAPS_FACTOR!r} else 1.0 end"
    but = (
        f"case when {bi} > 0 and {i} < {bi} then {BUT_BEFORE!r} "
        f"when {bi} > 0 and {i} > {bi} then {BUT_AFTER!r} else 1.0 end"
    )
    return f"(({b1}) * {b2} * {b3} * ({g1}) * ({g2}) * ({g3}) * ({caps}) * ({but}))"


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


def _py_tokens_raw(s: str | None) -> list[str]:
    """Case-preserving twin of _py_tokens (for the ALL-CAPS flags); same
    cleaning/splitting, so positions align with the lowercased tokens."""
    import re

    if s is None:
        return []
    cleaned = re.sub(r"[^a-zA-Z0-9 ]", " ", s.strip())
    return [t for t in cleaned.split() if t]


def _py_punct_emphasis(s: str | None) -> float:
    ep = min((s or "").count("!"), EP_MAX_EXCL) * EP_PER_EXCL
    qm_n = (s or "").count("?")
    qm = QM_MAX if qm_n > 3 else (qm_n * QM_PER if qm_n > 1 else 0.0)
    return ep + qm


def _py_kernel(s: str | None) -> tuple[float, float]:
    """Reference implementation of the kernel incl. every contextual
    mechanic (round 6: bigram dampeners, ALL-CAPS emphasis, but-clause
    re-weighting, punctuation emphasis): a matched token's signed unit AND
    weight are scaled by the product of its dyadic context factors. All
    values are dyadic, so summation order cannot change the result -- this
    is the exact same arithmetic the SQL kernel's join shape performs."""
    toks = _py_tokens(s)
    raw = _py_tokens_raw(s)
    caps = [t.isupper() for t in raw]
    n_caps = sum(caps)
    cap_diff = 0 < n_caps < len(toks)
    bi = toks.index("but") + 1 if "but" in toks else 0
    neg_set = set(NEGATE)
    wo, doubt = WITHOUT_DOUBT

    def _but(pos: int) -> float:
        if bi > 0 and pos < bi:
            return BUT_BEFORE
        if bi > 0 and pos > bi:
            return BUT_AFTER
        return 1.0

    # round-7 idiom pass (mirrors the SQL's per-token iw CASE + consumed OR):
    # first-match weight at each end position (3-grams before 2-grams);
    # consumed positions are the union over ALL occurrences incl. valence-0
    consumed: set[int] = set()
    idiom_ssum = 0.0
    idiom_wsum = 0.0
    idiom_nm = 0
    for i in range(len(toks)):
        for a, b, c, _v in IDIOMS_3:
            if i >= 2 and toks[i - 2] == a and toks[i - 1] == b and toks[i] == c:
                consumed.update((i - 2, i - 1, i))
        for a, b, _v in IDIOMS_2:
            if i >= 1 and toks[i - 1] == a and toks[i] == b:
                consumed.update((i - 1, i))
        iw = None
        for a, b, c, v in IDIOMS_3:
            if v and i >= 2 and toks[i - 2] == a and toks[i - 1] == b and toks[i] == c:
                iw = v
                break
        if iw is None:
            for a, b, v in IDIOMS_2:
                if v and i >= 1 and toks[i - 1] == a and toks[i] == b:
                    iw = v
                    break
        if iw is not None:
            f = _but(i + 1)
            idiom_ssum += f * (1.0 if iw > 0 else -1.0)
            idiom_wsum += f * iw
            idiom_nm += 1

    def _delta(tok: str | None) -> float:
        mf = MODIFIER_FACTORS.get(tok or "")
        return 0.0 if mf is None or mf < 0 else mf - 1.0

    ssum = 0.0
    wsum = 0.0
    nm = 0
    for i, t in enumerate(toks):
        w = LEXICON.get(t)
        if w is None or i in consumed:
            continue
        p1 = toks[i - 1] if i > 0 else None
        p2 = toks[i - 2] if i > 1 else None
        p3 = toks[i - 3] if i > 2 else None

        def _capsm(k: int) -> float:
            # caps-boosted booster (round 6c): an ALL-CAPS booster under a
            # caps differential doubles its delta
            j = i - k
            return 2.0 if cap_diff and 0 <= j < len(caps) and caps[j] else 1.0

        # position-1 booster (bigram dampener overrides)
        if p2 is not None and (p2, p1) in BOOST_BIGRAMS:
            f = BIGRAM_FACTOR
        else:
            f = 1.0 + _delta(p1) * _capsm(1)
        # distance-damped boosters at positions 2/3
        f *= 1.0 + _delta(p2) * B2_DAMP * _capsm(2)
        f *= 1.0 + _delta(p3) * B3_DAMP * _capsm(3)
        # per-position negation with the published overrides
        if p1 in neg_set:
            f *= NEG_FACTOR
        if p2 == "never" and p1 in NEVER_FOLLOWERS:
            f *= NEVER_INTENSIFY
        elif p2 == wo and p1 == doubt:
            pass
        elif p2 in neg_set:
            f *= NEG_FACTOR
        if p3 == "never" and (p2 in NEVER_FOLLOWERS or p1 in NEVER_FOLLOWERS):
            f *= NEVER_INTENSIFY
        elif p3 == wo and (p2 == doubt or p1 == doubt):
            pass
        elif p3 in neg_set:
            f *= NEG_FACTOR
        # defensive bound: exotic Unicode lowercasing (e.g. dotted-I) can
        # change token counts; both engines' SQL zips pad with NULL there
        if cap_diff and i < len(caps) and caps[i]:
            f *= CAPS_FACTOR
        f *= _but(i + 1)
        ssum += f * (1.0 if w > 0 else -1.0)
        wsum += f * w
        nm += 1
    ssum += idiom_ssum
    wsum += idiom_wsum
    nm += idiom_nm
    pe = _py_punct_emphasis(s)
    s2 = ssum + pe if ssum > 0 else (ssum - pe if ssum < 0 else ssum)
    vc = s2 / math.sqrt(s2 * s2 + VADER_ALPHA)
    tb = (wsum / nm) if nm else 0.0
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
    libs are absent (this container).

    AVAILABLE BUT NOT ENGINE-SELECTED (round-4 ADVICE): no engine data path
    calls this -- the engine always scores with the deterministic lexicon
    kernel, because the DuckDB correctness oracle is built from the same
    lexicon fragments and library scores would hash-mismatch it by design.
    This function + the `real_libraries_available()` probe exist so a
    deployment WITH the packages can swap it into sentiment_enrich's sum
    stage deliberately (accepting rows-only checks for those queries);
    tests/test_sentiment.py::test_library_kernel_wiring pins the contract
    either way."""
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
