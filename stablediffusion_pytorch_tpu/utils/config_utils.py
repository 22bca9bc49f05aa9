"""Condition-config validation helpers.

Same contracts as reference utils/config_utils.py:1-40, re-expressed for
this framework: a generic required-key checker drives the per-condition
validators, and the image spatial check reads NHWC axes 1/2 (the reference
is NCHW and reads 2/3).
"""


def _require(mapping, key, where):
    if key not in mapping:
        raise KeyError(f"'{key}' is required in the {where} but was not set")
    return mapping[key]


def validate_class_config(condition_config):
    sub = _require(condition_config, "class_condition_config",
                   "condition config when 'class' conditioning is enabled")
    _require(sub, "num_classes", "class condition config")


def validate_text_config(condition_config):
    sub = _require(condition_config, "text_condition_config",
                   "condition config when 'text' conditioning is enabled")
    _require(sub, "text_embed_dim", "text condition config")


def validate_image_config(condition_config):
    sub = _require(condition_config, "image_condition_config",
                   "condition config when 'image' conditioning is enabled")
    _require(sub, "image_condition_input_channels", "image condition config")
    _require(sub, "image_condition_output_channels", "image condition config")


def validate_image_conditional_input(cond_input, x):
    mask = _require(cond_input, "image",
                    "cond_input for an image-conditioned model")
    if mask.shape[0] != x.shape[0]:
        raise ValueError(
            f"image condition batch {mask.shape[0]} != latent batch "
            f"{x.shape[0]}")
    if mask.shape[1] % x.shape[1] != 0:  # NHWC: axis 1 = height
        raise ValueError(
            f"image condition height {mask.shape[1]} must be an integer "
            f"multiple of the latent height {x.shape[1]}")


def validate_class_conditional_input(cond_input, x, num_classes):
    onehot = _require(cond_input, "class",
                      "cond_input for a class-conditioned model")
    expect = (x.shape[0], num_classes)
    if tuple(onehot.shape) != expect:
        raise ValueError(
            f"class condition shape {tuple(onehot.shape)} != {expect} "
            f"(batch, num_classes)")


def get_config_value(config, key, default_value):
    return config.get(key, default_value)
