from tod_tpu.utils.config import merge_dict, parse_json_params

__all__ = ["merge_dict", "parse_json_params"]
