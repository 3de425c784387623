from .loader import SafetensorsFile, load_safetensors_dir

__all__ = ["SafetensorsFile", "load_safetensors_dir"]
