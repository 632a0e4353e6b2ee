from levelsetfusion_tpu.utils import telemetry, visualization, config, checkpoint

__all__ = ["telemetry", "visualization", "config", "checkpoint"]
