from .torch_convert import assert_tree_compatible, convert_state_dict

__all__ = ["assert_tree_compatible", "convert_state_dict"]
