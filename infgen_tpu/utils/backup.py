"""Source-tree snapshot at run start (reference run.py:17-48,86-89)."""

import fnmatch
import os
import shutil


def backup_source(save_dir: str, repo_root: str = None,
                  patterns=("*.py", "*.yaml", "*.md")):
    """Copy source files into <save_dir>/backup_source for reproducibility."""
    repo_root = repo_root or os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    dst_root = os.path.join(save_dir, "backup_source")
    for dirpath, dirnames, filenames in os.walk(repo_root):
        dirnames[:] = [d for d in dirnames
                       if not d.startswith(".") and d not in
                       ("runs", "__pycache__", ".jax_cache", "backup_source")]
        for fn in filenames:
            if any(fnmatch.fnmatch(fn, p) for p in patterns):
                src = os.path.join(dirpath, fn)
                rel = os.path.relpath(src, repo_root)
                dst = os.path.join(dst_root, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copy2(src, dst)
    return dst_root
