"""SMPL-H body model: chumpy-free loader + vectorised JAX LBS forward."""

from interdiff_tpu.smpl.model import SmplModel, smpl_forward  # noqa: F401
from interdiff_tpu.smpl.loader import load_smpl_pkl, smpl_model_from_pkl  # noqa: F401
