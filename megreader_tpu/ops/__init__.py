from .ctc import ctc_beam_decode, ctc_greedy_decode, ctc_loss

__all__ = ["ctc_beam_decode", "ctc_greedy_decode", "ctc_loss"]
