from .loader import ConfigNode, load_config, build_components  # noqa: F401
