from projected_langevin_sampling_tpu.utils.prng import KeyArray, as_key, normal, split_like

__all__ = ["KeyArray", "as_key", "normal", "split_like"]
