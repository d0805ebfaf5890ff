"""Safe torch checkpoint loading shared by all weight converters.

torch.load on an untrusted file executes arbitrary pickled code;
weights_only=True restricts unpickling to tensor/container types. All the
public checkpoints this repo converts (SuperPoint/SuperGlue/LightGlue/
DISK/D2-Net/MASt3R/PatchmatchNet/MegaLoc) are plain tensor state_dicts,
so weights_only loading is attempted first and the permissive path only
used as an explicit, warned fallback for legacy formats.
"""

from __future__ import annotations

import warnings


def load_torch_checkpoint(path: str):
    """torch.load with weights_only=True, falling back (with a warning)
    for checkpoints whose container types the restricted unpickler
    rejects."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:  # pickle.UnpicklingError or container rejection
        warnings.warn(
            f"weights_only torch.load failed for {path} ({e}); falling back "
            "to the permissive loader — only do this for trusted files",
            stacklevel=2,
        )
        return torch.load(path, map_location="cpu", weights_only=False)
