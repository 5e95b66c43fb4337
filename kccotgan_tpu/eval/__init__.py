from .metrics import best_of_k, psnr, ssim, video_metrics

__all__ = ["psnr", "ssim", "video_metrics", "best_of_k"]
