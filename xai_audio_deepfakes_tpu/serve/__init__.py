from xai_audio_deepfakes_tpu.serve.viewer import build_gallery, serve_gallery
