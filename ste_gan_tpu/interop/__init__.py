from ste_gan_tpu.interop.torch_import import (  # noqa: F401
    convert_discriminator_state_dict, convert_encoder_state_dict,
    convert_generator_state_dict, fix_state_dict, load_torch_state_dict)
