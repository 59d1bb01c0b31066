"""METEOR (python approximation).

The reference scores METEOR through the pycocoevalcap Java jar
(``misc/cocoeval.py:4-9``); no JVM dependency is acceptable here, so this is
a self-contained python implementation of the METEOR 1.x algorithm:

* stage-wise unigram alignment (exact -> porter stem -> WordNet synonym,
  when nltk wordnet data is locally available; exact+stem otherwise),
* F_alpha mean (alpha=0.9) of precision/recall over the best reference,
* fragmentation penalty gamma * frag^beta with the classic parameters
  (alpha=0.9, beta=3.0, gamma=0.5).

Scores track the Java implementation closely but are not bit-identical; the
deviation is consistent across systems so rankings/model selection are
preserved. CIDEr (the selection metric) is exact.
"""

from typing import List

try:
    from nltk.stem.porter import PorterStemmer
    _STEMMER = PorterStemmer()
except Exception:  # pragma: no cover
    _STEMMER = None

_WORDNET = None


def _get_wordnet():
    global _WORDNET
    if _WORDNET is None:
        try:
            from nltk.corpus import wordnet
            wordnet.synsets("dog")  # probe local data
            _WORDNET = wordnet
        except Exception:
            _WORDNET = False
    return _WORDNET or None


def _synonyms(word):
    wn = _get_wordnet()
    if wn is None:
        return set()
    syns = set()
    try:
        for s in wn.synsets(word):
            for l in s.lemmas():
                syns.add(l.name().lower())
    except Exception:
        return set()
    return syns


def _align_native(hyp: List[str], ref: List[str]):
    """Native (C++) exact+stem alignment; None when lib/wordnet conditions
    don't allow it (native path skips the wordnet synonym stage, so it is
    only used when wordnet data is absent — which also holds for the python
    path then)."""
    if _get_wordnet() is not None:
        return None
    try:
        from care_tpu import native
        if not native.available():
            return None
        interned = {}
        he = [interned.setdefault(t, len(interned)) for t in hyp]
        re_ = [interned.setdefault(t, len(interned)) for t in ref]
        if _STEMMER is not None:
            hs = [interned.setdefault(_STEMMER.stem(t), len(interned))
                  for t in hyp]
            rs = [interned.setdefault(_STEMMER.stem(t), len(interned))
                  for t in ref]
        else:
            hs, rs = he, re_
        result = native.meteor_align(he, hs, re_, rs)
        if result is None:
            return None
        return result[0]
    except Exception:
        return None


def _align(hyp: List[str], ref: List[str]):
    """Greedy stage-wise alignment; returns list of (hyp_idx, ref_idx)."""
    native_matches = _align_native(hyp, ref)
    if native_matches is not None:
        return native_matches
    matches = []
    used_h, used_r = set(), set()

    def stage(match_fn):
        for i, hw in enumerate(hyp):
            if i in used_h:
                continue
            for j, rw in enumerate(ref):
                if j in used_r:
                    continue
                if match_fn(hw, rw):
                    matches.append((i, j))
                    used_h.add(i)
                    used_r.add(j)
                    break

    stage(lambda a, b: a == b)
    if _STEMMER is not None:
        stage(lambda a, b: _STEMMER.stem(a) == _STEMMER.stem(b))
    if _get_wordnet() is not None:
        stage(lambda a, b: a in _synonyms(b) or b in _synonyms(a))
    return matches


def _chunks(matches):
    """Number of contiguous aligned chunks (both sides monotone+adjacent)."""
    if not matches:
        return 0
    ms = sorted(matches)
    chunks = 1
    for (h0, r0), (h1, r1) in zip(ms, ms[1:]):
        if not (h1 == h0 + 1 and r1 == r0 + 1):
            chunks += 1
    return chunks


def _score_pair(hyp: List[str], ref: List[str],
                alpha=0.9, beta=3.0, gamma=0.5):
    matches = _align(hyp, ref)
    m = len(matches)
    if m == 0 or not hyp or not ref:
        return 0.0
    precision = m / len(hyp)
    recall = m / len(ref)
    fmean = precision * recall / (alpha * precision + (1 - alpha) * recall)
    frag = _chunks(matches) / m
    penalty = gamma * (frag ** beta)
    return fmean * (1 - penalty)


def compute_meteor(gts: dict, res: dict):
    scores = []
    for vid in gts:
        hyp = res[vid][0].split()
        best = max(_score_pair(hyp, r.split()) for r in gts[vid])
        scores.append(best)
    mean = sum(scores) / max(len(scores), 1)
    return mean, scores
