"""Small shared utilities."""

from __future__ import annotations

import atexit
import shutil
import tempfile


def scratch_dir(prefix: str) -> str:
    """mkdtemp that is removed at interpreter exit — repeated gate/bench
    invocations must not accumulate corpus-sized litter in /tmp."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d
