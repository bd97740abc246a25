from .images import decode_image, encode_png, encode_lossy, psnr

__all__ = ["decode_image", "encode_png", "encode_lossy", "psnr"]
