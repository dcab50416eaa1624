"""Weight store + checkpoint conversion subsystem."""

from .convert import ConversionError, convert_state_dict
from .store import (get_model_file, get_model_metainfo,
                    get_model_metainfo_dict, load_pretrained)

__all__ = ["ConversionError", "convert_state_dict", "get_model_file",
           "get_model_metainfo", "get_model_metainfo_dict",
           "load_pretrained"]
