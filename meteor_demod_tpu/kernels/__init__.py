from .block_demod import make_pallas_batch_demod

__all__ = ["make_pallas_batch_demod"]
