"""Pure-python PTB-style tokenizer.

Replaces pycocoevalcap's Java ``PTBTokenizer`` subprocess (used by the
reference through ``misc/cocoeval.py:4-9``). Implements the same
normalisation the COCO pipeline applies: lowercase, strip the punctuation
set PTBTokenizer removes, split on whitespace with basic PTB-ish handling of
contractions and symbols.

Captions in this pipeline are already near-tokenised (they come from the
corpus builder's whitespace-tokenised vocab), so the practical requirement
is consistent treatment of refs and predictions, which this provides.
"""

import re

# punctuation PTBTokenizer removes (see coco-caption PTBTokenizer PUNCTUATIONS)
_PUNCTUATIONS = ["''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
                 ".", "?", "!", ",", ":", "-", "--", "...", ";"]
_PUNCT_SET = set(_PUNCTUATIONS)

_NT = re.compile(r"(?<=[a-z])n't\b")
_CONTRACTIONS = re.compile(r"([a-z])('(s|d|ll|re|ve|m))\b")
# PTBTokenizer's special multi-word splits (Stanford PTBLexer)
_SPECIAL_SPLITS = {"cannot": "can not", "gonna": "gon na",
                   "gotta": "got ta", "wanna": "wan na",
                   "lemme": "lem me", "gimme": "gim me"}


def ptb_tokenize(caption: str):
    """Tokenize one caption -> list of tokens."""
    s = caption.lower().strip()
    # separate standard punctuation so it can be dropped as tokens
    s = re.sub(r"([.,!?:;])", r" \1 ", s)
    # Stanford n't handling: "don't" -> "do n't"
    s = _NT.sub(" n't", s)
    s = _CONTRACTIONS.sub(r"\1 \2", s)
    s = " ".join(_SPECIAL_SPLITS.get(t, t) for t in s.split())
    tokens = [t for t in s.split(" ") if t and t not in _PUNCT_SET]
    return tokens


def tokenize_corpus(captions_for_image: dict) -> dict:
    """dict[id] -> list of {'caption': str}  =>  dict[id] -> list of str
    (space-joined tokenized captions), mirroring PTBTokenizer.tokenize."""
    out = {}
    for k, caps in captions_for_image.items():
        out[k] = [" ".join(ptb_tokenize(c["caption"])) for c in caps]
    return out
