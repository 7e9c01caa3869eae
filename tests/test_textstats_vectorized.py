"""The vectorized QualityScore/LangId kernels must reproduce the
original per-row Python semantics exactly (they are oracle-checked
operators; this pins the Arrow-kernel equivalence on adversarial
strings the synth corpus may not cover)."""

import re

import numpy as np
import pandas as pd

from osm2world_ray.stages.textstats import _LANG_STOPWORDS, LangId, QualityScore

_TEXTS = [
    "the cat and the dog",
    "",
    " leading and  double  spaces ",
    "der hund und die katze ist nicht da",
    "le chat est dans la maison pour le chien",
    "no stopwords here xyzzy 12345 mixed42tokens",
    "UPPER The And OF lowercase the the the",
    "tabs\tand\nnewlines der die das und ist",
    "el perro y la casa es un una que los las",
    "a in is it for to of that the and",
]


def _batch():
    return pd.DataFrame(
        {"doc_id": np.arange(len(_TEXTS), dtype=np.int64), "text": _TEXTS}
    )


def test_quality_score_matches_python_reference():
    out = QualityScore()(_batch()).to_pandas()
    stop = _LANG_STOPWORDS["en"]
    wre = re.compile(r"[a-z]+|[0-9]+")
    for i, t in enumerate(_TEXTS):
        toks = t.split(" ")
        assert out.n_tokens[i] == len(toks), t
        assert out.n_chars[i] == len(t)
        assert out.stopword_count[i] == sum(1 for w in toks if w in stop), t
        assert out.n_words_regex[i] == len(wre.findall(t)), t


def test_lang_id_matches_python_reference():
    out = LangId()(_batch()).to_pandas()
    for i, t in enumerate(_TEXTS):
        ws = set(t.lower().split())
        best, best_n = "und", 0
        for lang, prof in _LANG_STOPWORDS.items():
            n = len(ws & prof)
            if n > best_n:
                best, best_n = lang, n
        assert out.lang_guess[i] == best, (t, best)
