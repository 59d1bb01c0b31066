from care_tpu.decoding.beam_search import beam_search, BeamState
from care_tpu.decoding.translator import (
    Translator, TranslatorARFormer, TranslatorNARFormer, get_translator)

__all__ = ["beam_search", "BeamState", "Translator", "TranslatorARFormer",
           "TranslatorNARFormer", "get_translator"]
