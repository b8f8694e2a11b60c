from sparsernns_tpu.models.seq_model import (ClassificationModel,
                                             RegressionModel, RetrievalModel,
                                             StackedEncoderModel)
from sparsernns_tpu.models.ssm import S5SSM, make_ssm_init_fn
from sparsernns_tpu.models.ssm_init import blocked_dplr_init, make_dplr_hippo

__all__ = [
    "S5SSM",
    "make_ssm_init_fn",
    "blocked_dplr_init",
    "make_dplr_hippo",
    "StackedEncoderModel",
    "ClassificationModel",
    "RegressionModel",
    "RetrievalModel",
]
