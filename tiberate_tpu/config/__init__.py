from tiberate_tpu.config.ckks_config import CkksConfig, Preset
from tiberate_tpu.config.security_parameters import (
    maximum_qbits,
    minimum_cyclotomic_order,
)

__all__ = ["CkksConfig", "Preset", "maximum_qbits", "minimum_cyclotomic_order"]
