from tiberate_tpu.engine.ckks_engine import CkksEngine

__all__ = ["CkksEngine"]
