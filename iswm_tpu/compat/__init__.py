from .torch_import import (
    adapt_stem_in_channels,
    import_torch_state_dict,
    load_reference_checkpoint,
    strip_module_prefix,
)

__all__ = [
    "adapt_stem_in_channels",
    "import_torch_state_dict",
    "load_reference_checkpoint",
    "strip_module_prefix",
]
