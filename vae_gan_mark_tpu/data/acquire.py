"""Data/checkpoint acquisition utilities (SURVEY.md §2.1).

The reference ships two run-once scripts: a Kaggle dataset downloader
(dataset.py:1-6, kagglehub `andrey101/marketing-data-new`) and a HuggingFace
checkpoint snapshot downloader (set_model.py:1-7 — which hardcodes an HF
token; here credentials come from the environment ONLY: KAGGLE_* /
HF_TOKEN). Both libraries are optional — a clear error explains what to
install/configure when missing, and everything else in the framework works
without them.
"""

from __future__ import annotations

import os

DATASET_HANDLE = "andrey101/marketing-data-new"
CHECKPOINT_REPO = "fkand/vae-gan-test"


def download_dataset(handle: str = DATASET_HANDLE) -> str:
    """Download the marketing dataset via kagglehub; returns the local path."""
    try:
        import kagglehub
    except ImportError as e:
        raise RuntimeError(
            "kagglehub is not installed; install it and configure Kaggle "
            "credentials (KAGGLE_USERNAME/KAGGLE_KEY) to download "
            f"{handle}") from e
    path = kagglehub.dataset_download(handle)
    print(f"dataset at: {path}")
    return path


def download_checkpoints(repo_id: str = CHECKPOINT_REPO,
                         local_dir: str = "checkpoints_vaegan_wandb") -> str:
    """Snapshot-download pretrained reference checkpoints from HF hub.

    Token from HF_TOKEN / HUGGING_FACE_HUB_TOKEN env (never hardcoded).
    """
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:
        raise RuntimeError("huggingface_hub is not installed") from e
    token = (os.environ.get("HF_TOKEN")
             or os.environ.get("HUGGING_FACE_HUB_TOKEN"))
    path = snapshot_download(repo_id=repo_id, local_dir=local_dir,
                             token=token)
    print(f"checkpoints at: {path}")
    return path


def device_report() -> dict:
    """TPU-era equivalent of the reference's GPU probe (check_gpu.py:1-4):
    reports the JAX backend, device inventory, and per-device memory."""
    import jax
    devices = jax.devices()
    info = {
        "backend": jax.default_backend(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "process_count": jax.process_count(),
        "devices": [str(d) for d in devices],
    }
    stats = []
    for d in devices:
        try:
            ms = d.memory_stats()
            stats.append({"device": str(d),
                          "bytes_limit": ms.get("bytes_limit"),
                          "bytes_in_use": ms.get("bytes_in_use")})
        except Exception:
            stats.append({"device": str(d), "memory_stats": "unavailable"})
    info["memory"] = stats
    return info


if __name__ == "__main__":
    import json
    print(json.dumps(device_report(), indent=2))
