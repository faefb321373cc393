from mcan_vqa_tpu.configs.config import Config

__all__ = ["Config"]
