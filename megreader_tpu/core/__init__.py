from .charset import AttentionCharset, Charset, DEFAULT_ALPHABET
from .config import Config, apply_overrides, instantiate, load_yaml, parse_cli_overrides
from .registry import COMPONENTS, register, resolve

__all__ = [
    "AttentionCharset",
    "Charset",
    "DEFAULT_ALPHABET",
    "Config",
    "apply_overrides",
    "instantiate",
    "load_yaml",
    "parse_cli_overrides",
    "COMPONENTS",
    "register",
    "resolve",
]
