"""HuggingFace hub checkpoint helpers (reference scripts/hf_model.py:12-112).

Optional: gated on huggingface_hub availability (this image has no network
egress; these are for deployment environments).
"""

import os


def _require_hub():
    try:
        import huggingface_hub  # noqa: F401
        return huggingface_hub
    except ImportError as e:
        raise RuntimeError(
            "huggingface_hub is not installed; install it to use hub helpers"
        ) from e


def upload_checkpoint(ckpt_dir: str, repo_id: str, token: str = None):
    hub = _require_hub()
    api = hub.HfApi(token=token or os.environ.get("HF_TOKEN"))
    api.create_repo(repo_id, exist_ok=True)
    api.upload_folder(folder_path=ckpt_dir, repo_id=repo_id,
                      path_in_repo="ckpt")
    return f"https://huggingface.co/{repo_id}"


def download_checkpoint(repo_id: str, local_dir: str, token: str = None):
    hub = _require_hub()
    return hub.snapshot_download(repo_id, local_dir=local_dir,
                                 token=token or os.environ.get("HF_TOKEN"))
