"""Rhetorical-figure detection + persuasion scoring.

Reference capability: modules/nlp/app/tuktu/nlp/models/Rhetorics.scala
(find / persuasionScore / messagePersuasionScore) and the processor pair
processors/{RhetoricsProcessor,PersuasionProcessor}.scala. Ten figures of
repetition counted per message from tokens + POS tags: epizeuxis,
polysyndeton, anaphora, epistrophe, epanalepsis, anadiplosis, ploche,
antimetabole, alliteration, polyptoton. The finders are re-derived from
the criteria documented in the reference (its per-figure doc comments),
not transliterated; deliberate deviations from implementation quirks are
noted inline. Branchy per-message list logic -> the sanctioned Arrow
pandas-UDF seam (like ml/porter2.py); counts are ints so results are
engine-portable.

The persuasion score is the reference's published linear model: per
engagement type (comments/likes/shares/favorites/replies/retweets), a
dot product of 8 clamped emotion features and 8 rhetoric counts with the
learned weights hardcoded in Rhetorics.scala:565-795 — those constants
ARE the model spec, reproduced here as data tables with that citation.

Language resources (the reference loads <lang>-conj.json from its
classpath): ``Resources`` carries the conjunction TAG list, conjunction
WORD list and determiner TAG list; English defaults match our Penn-style
tagger (ml/rbem.py). Pass custom lists per language.
"""

from __future__ import annotations

from dataclasses import dataclass, field

PUNCT = {";", ",", ".", "!", "?", ":"}
SENT_BREAKS = {";", ".", "!", "?", ":"}

FIGURES = (
    "epizeuxis", "polysyndeton", "anaphora", "epistrophe", "epanalepsis",
    "anadiplosis", "ploche", "antimetabole", "alliteration", "polyptoton",
)


@dataclass
class Resources:
    """Per-language conjunction/determiner resources (<lang>-conj.json)."""

    conjunction_tags: list[str] = field(default_factory=lambda: ["CC"])
    conjunction_words: list[str] = field(
        default_factory=lambda: ["and", "or", "but", "nor", "so", "yet", "for"]
    )
    determiner_tags: list[str] = field(default_factory=lambda: ["DT"])


def _strip_punct(word: str) -> str:
    return "".join(ch for ch in word if ch not in ";,.!?:")


def _split_units(tokens: list[str], breaks: set[str], break_words: set[str]):
    """Split a token list into units at break tokens (and break words),
    stripping attached punctuation characters and dropping empties."""
    units: list[list[str]] = []
    cur: list[str] = []
    for tok in tokens:
        if tok in breaks or tok in break_words:
            if cur:
                units.append(cur)
            cur = []
            continue
        w = _strip_punct(tok)
        if w:
            cur.append(w)
    if cur:
        units.append(cur)
    return units


def _epizeuxis(words: list[str]) -> int:
    """Immediate repetition of a word or phrase (w T w T patterns)."""
    count, i = 0, 0
    while i < len(words):
        tail = words[i + 1 :]
        match = None
        for m in range(len(tail)):
            if tail[m] == words[i] and tail[:m] == tail[m + 1 : 2 * m + 1]:
                match = m
                break
        if match is not None:
            count += 1
            i = i + 1 + match
        else:
            i += 1
    return count


def rhetorics_find(
    tokens: list[str], tags: list[str], res: Resources | None = None
) -> dict[str, int]:
    """Count the ten rhetorical figures in one message."""
    res = res or Resources()
    tokens = [t.lower() for t in tokens]
    # the reference resolves a word's tag via tokens.indexOf(word): the
    # FIRST occurrence's tag stands for every occurrence
    tag_of: dict[str, str] = {}
    for tok, tag in zip(tokens, tags):
        tag_of.setdefault(tok, tag)

    conj_tags = set(res.conjunction_tags)
    conj_words = set(res.conjunction_words)
    det_tags = set(res.determiner_tags)

    def is_conj(word: str) -> bool:
        return word in conj_words or tag_of.get(word) in conj_tags

    def is_conj_or_det(word: str) -> bool:
        return is_conj(word) or tag_of.get(word) in det_tags

    unpunct = [t for t in tokens if t not in PUNCT]
    sentences = _split_units(tokens, SENT_BREAKS, set())
    phrases = _split_units(tokens, SENT_BREAKS | {","}, conj_words)

    # 1. epizeuxis
    epizeuxis = _epizeuxis(unpunct)

    # 2. polysyndeton: >2 same conjunctions inside one sentence, plus
    # sentence pairs opening with the same conjunction
    poly = 0
    for sent in sentences:
        groups: dict[str, int] = {}
        for w in sent:
            if is_conj(w):
                groups[w] = groups.get(w, 0) + 1
        poly += sum(1 for c in groups.values() if c > 2)
    for i in range(len(sentences)):
        for j in range(i + 1, len(sentences)):
            h1, h2 = sentences[i][0], sentences[j][0]
            if is_conj(h1) and is_conj(h2) and h1 == h2:
                poly += 1

    # 3/4. anaphora / epistrophe: consecutive phrases (len >= 3) sharing
    # the first / last word, heads not conjunctions or determiners
    def _echo(units: list[list[str]], last: bool) -> int:
        use = [u[::-1] if last else u for u in units if len(u) > 2]
        n = 0
        for a, b in zip(use, use[1:]):
            if (
                not is_conj_or_det(a[0])
                and not is_conj_or_det(b[0])
                and a[0] == b[0]
            ):
                n += 1
        return n

    anaphora = _echo(phrases, last=False)
    epistrophe = _echo(phrases, last=True)

    # 5. epanalepsis: a unit that ends with the word(s) it began with.
    # DEVIATION: the reference's per-sentence branch compares the trailing
    # phrase against the whole MESSAGE's opening words
    # (Rhetorics.scala:319 `unPunctuated(index)`) — we compare against the
    # SAME unit's opening, the documented intent.
    def _epanalepsis_unit(unit: list[str]) -> int:
        if len(unit) < 2:
            return 0
        first = unit[0]
        occurrences = [k for k, w in enumerate(unit) if w == first]
        if len(occurrences) < 2:
            return 0
        trailing = unit[occurrences[-1] :]
        return 1 if trailing == unit[: len(trailing)] else 0

    epanalepsis = sum(_epanalepsis_unit(s) for s in sentences)
    epanalepsis += _epanalepsis_unit(unpunct)

    # 6. anadiplosis: phrase ends with the word(s) the next phrase begins
    # with (suffix of previous == prefix of next, anchored on the last
    # word of the previous phrase)
    anadiplosis = 0
    for a, b in zip(phrases, phrases[1:]):
        if not a:
            continue
        last_word = a[-1]
        if last_word in b:
            prefix = b[: b.index(last_word) + 1]
            if a[-len(prefix) :] == prefix:
                anadiplosis += 1

    # 7. ploche: content-word repetition in neighboring phrases (part1),
    # within one phrase (part2), or 3+ times across remaining phrases
    content = lambda u: [w for w in u if not is_conj_or_det(w)]
    part1: dict[int, int] = {}
    for i in range(1, len(phrases)):
        p1, p2 = phrases[i - 1], phrases[i]
        part1[i - 1] = len({w for w in content(p1) if w in p2})
    part2: dict[int, int] = {}
    for i, phrase in enumerate(phrases):
        groups = {}
        for w in content(phrase):
            groups[w] = groups.get(w, 0) + 1
        part2[i] = sum(1 for c in groups.values() if c > 1)
    used = {i for i, c in part1.items() if c > 0} | {
        i for i, c in part2.items() if c > 0
    }
    rest = [w for i, p in enumerate(phrases) if i not in used for w in content(p)]
    groups = {}
    for w in rest:
        groups[w] = groups.get(w, 0) + 1
    part3 = sum(1 for c in groups.values() if c > 2)
    ploche = sum(part1.values()) + sum(part2.values()) + part3

    # 8. antimetabole: consecutive phrases repeating >= 2 words in
    # reverse order, tolerating a one-char ending difference
    def _root_eq(w1: str, w2: str) -> bool:
        return w1 == w2 or w1[:-1] == w2 or w1 == w2[:-1] or w1[:-1] == w2[:-1]

    antimetabole = 0
    cphrases = [content(p) for p in phrases]
    for a, b in zip(cphrases, cphrases[1:]):
        ra = a[::-1]
        if not ra or ra[0] not in b:
            continue
        rb = b[b.index(ra[0]) :]
        if len(ra) > 1 and len(rb) > 1:
            if _root_eq(ra[0], rb[0]) and _root_eq(ra[1], rb[1]):
                antimetabole += 1

    # 9. alliteration: adjacent tokens sharing the initial character
    alliteration = sum(
        1
        for a, b in zip(tokens, tokens[1:])
        if a and b and a[0] == b[0]
    )

    # 10. polyptoton: word pairs (len >= 4) sharing the first 3 chars
    # with different endings
    polyptoton = 0
    for i in range(len(tokens)):
        for j in range(i + 1, len(tokens)):
            w1, w2 = tokens[i], tokens[j]
            if (
                len(w1) >= 4
                and len(w2) >= 4
                and w1[:3] == w2[:3]
                and w1[3:] != w2[3:]
            ):
                polyptoton += 1

    return dict(
        zip(
            FIGURES,
            (
                epizeuxis, poly, anaphora, epistrophe, epanalepsis,
                anadiplosis, ploche, antimetabole, alliteration, polyptoton,
            ),
        )
    )


# --- persuasion linear model (Rhetorics.scala:565-795, learned weights
# reproduced as the model spec) ---------------------------------------------

#: per engagement type: (emotion weights[8], rhetoric weights[8]) — the
#: emotion features are max/min clamps of (joySadness, trustDisgust,
#: fearAnger, surpriseAnticipation); the rhetoric features are the first
#: 8 figure counts in FIGURES order.
PERSUASION_WEIGHTS: dict[str, tuple[list[float], list[float]]] = {
    "comments": (
        [0.01243725278997453, -0.07698199310088816, -0.03707076588320809,
         0.13780319691651857, -0.06650589424456294, -0.11494084315100916,
         0.0, 0.14828830220826394],
        [-0.18310024752990925, 0.019399340616698457, 0.05656322767942813,
         -0.005348645123531657, -0.07781453194950967, 0.01759859854897186,
         0.013402842482725054, 0.0],
    ),
    "likes": (
        [-0.004155879437276768, -0.008453516154413762,
         -0.00048134932635483503, 0.007309854196279558,
         -0.0035457964960633847, -0.01579472651480441, 0.0,
         0.006805643194034698],
        [-0.013931341038583098, -0.0020157593960464914,
         0.0033428955699532975, -0.00874163807440474,
         -0.012522774121273627, -0.0027326774977177695,
         0.002755706656549446, 0.0],
    ),
    "shares": (
        [-0.0038668272284717326, -0.03365839484016331, 0.002692688083527883,
         -0.0037499982577047057, -0.010972176970288176,
         -0.025582429309074426, 0.0, -0.017200943402839373],
        [-0.012070725443170198, -0.00121481517554659, 0.023967307706185804,
         -0.003330663240129936, -0.028435621568767562,
         -0.012255856107876092, 0.004065130622696185, 0.0],
    ),
    "favorites": (
        [0.024800032344657878, -0.004777641963760246, 0.011236949666210572,
         -0.04339042539556042, -0.030005299865366146, 0.002133167387342567,
         0.041277389517411056, -0.0004372555968961137],
        [-0.03446012845802453, 0.012949373505111439, 0.0853601071307724,
         -0.021440689248736336, 0.01706202999811805, 0.027214092339941938,
         0.0327978948112069, -0.01979428323038217],
    ),
    "replies": (
        [0.004400741996761045, -0.004451300969127002, -0.010001832998610426,
         -0.016131043681605353, -0.021103166405406347, 0.04747099651542806,
         0.03413266707674853, -0.015599806250490568],
        [-0.024638623812557447, -0.02132952044777881, 0.016408800542881657,
         0.008631323497999523, -0.013922151701612094, 0.03556666749445554,
         0.005117266695653109, -0.011699892105854906],
    ),
    "retweets": (
        [0.01283263426811265, -0.015167768229712959, -0.008816686431890883,
         -0.010397153790698947, -0.03596629349186481, 0.04720398433849748,
         0.017492944745416433, -0.002131584981046307],
        [-0.04410027564895524, 0.006936658261575759, 0.06878315455821574,
         -0.02936764697622178, 0.011511011885622124, 0.07180940812836727,
         0.016855596735197393, -0.0647607629115718],
    ),
}

EMOTION_AXES = ("joySadness", "trustDisgust", "fearAnger", "surpriseAnticipation")

#: FastText-style single-emotion strings -> axis vector
EMOTION_ALIASES: dict[str, dict[str, float]] = {
    "happiness": {"joySadness": 1.0},
    "sadness": {"joySadness": -1.0},
    "fear": {"fearAnger": 1.0},
    "anger": {"fearAnger": -1.0},
    "disgust": {"trustDisgust": -1.0},
    "surprise": {"surpriseAnticipation": 1.0},
}

DEFAULT_TYPE_WEIGHTS = {
    "comments": 1.0, "likes": 1.0, "shares": 1.0,
    "replies": 1.0, "favorites": 1.0, "retweets": 1.0,
}


def persuasion_score(
    tokens: list[str],
    tags: list[str],
    emotions: dict[str, float] | str,
    type_weights: dict[str, float] | None = None,
    res: Resources | None = None,
) -> float:
    """messagePersuasionScore: sum over engagement types of
    weight * (emotion dot + rhetoric dot)."""
    if isinstance(emotions, str):
        emotions = EMOTION_ALIASES.get(emotions, {})
    emo = {axis: float(emotions.get(axis, 0.0)) for axis in EMOTION_AXES}
    emo_feats = []
    for axis in EMOTION_AXES:
        emo_feats.append(max(emo[axis], 0.0))
        emo_feats.append(min(emo[axis], 0.0))
    counts = rhetorics_find(tokens, tags, res)
    rhet_feats = [float(counts[f]) for f in FIGURES[:8]]
    weights = type_weights or DEFAULT_TYPE_WEIGHTS
    total = 0.0
    for typ, w in weights.items():
        ew, rw = PERSUASION_WEIGHTS[typ]
        total += w * (
            sum(a * b for a, b in zip(emo_feats, ew))
            + sum(a * b for a, b in zip(rhet_feats, rw))
        )
    return total
