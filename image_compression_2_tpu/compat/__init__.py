from .torch_import import (
    extract_pickle_state,
    import_encoder_state,
    import_generator_state,
    import_lpips_state,
    load_torch_checkpoint,
)

__all__ = [
    "extract_pickle_state",
    "import_encoder_state",
    "import_generator_state",
    "import_lpips_state",
    "load_torch_checkpoint",
]
