"""Config system: YAML loading, built-in presets, width scaling, QAT knobs.

Mirrors the reference's dual config style (SURVEY.md §2.5) under one roof:
  * YAML configs with sections dataset_params / diffusion_params / ldm_params /
    autoencoder_params / train_params (/ model_paths), consumed with
    yaml.safe_load (reference: tools/*.py)
  * flat-python "cfg module" presets assembling condition_config /
    diffusion_model_config / dit_model_config dicts
    (reference: Model_DiT_12L_config.py, config/celebhq_text_image_cond_tc05.py)
"""

from stablediffusion_pytorch_tpu.config.loader import load_config, Config
from stablediffusion_pytorch_tpu.config.ldm_scaling import build_ldm_scaling
from stablediffusion_pytorch_tpu.config import presets
from stablediffusion_pytorch_tpu.config import andi_config
