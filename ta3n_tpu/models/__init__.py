from ta3n_tpu.models.video_model import StreamOutput, VideoModel

__all__ = ["StreamOutput", "VideoModel"]
