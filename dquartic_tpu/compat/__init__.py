from .torch_ckpt import (
    convert_unet1d_state_dict,
    convert_custom_transformer_state_dict,
    convert_checkpoint_file,
)

__all__ = [
    "convert_unet1d_state_dict",
    "convert_custom_transformer_state_dict",
    "convert_checkpoint_file",
]
