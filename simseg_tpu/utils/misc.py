"""Small host-side helpers.

Parity: reference ``simseg/utils/misc.py`` — AverageMeter (:377-400),
Singleton (:403-413, lives in utils/context.py here), split_list_evenly and
list/type helpers used by the hooks and eval tools.
"""

from __future__ import annotations

from typing import Any, List, Sequence


class AverageMeter:
    """Tracks current value, running sum, count and mean
    (parity: misc.py:377-400)."""

    def __init__(self, name: str = "", fmt: str = ":f") -> None:
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def __str__(self) -> str:
        return f"{self.name} {self.val:{self.fmt[1:]}} ({self.avg:{self.fmt[1:]}})"


def split_list_evenly(lst: Sequence[Any], n: int) -> List[List[Any]]:
    """Split into n chunks whose sizes differ by at most one
    (parity: misc.py split_list_evenly)."""
    q, r = divmod(len(lst), n)
    out, start = [], 0
    for i in range(n):
        size = q + (1 if i < r else 0)
        out.append(list(lst[start:start + size]))
        start += size
    return out


def to_list(x: Any) -> list:
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]


def download(url: str, timeout: int = 20, retry: int = 3) -> bytes:
    """Fetch a URL with bounded retries (parity: misc.py:416-430 — requests
    loop retrying non-OK statuses; stdlib urllib here, no extra dep). Raises
    after ``retry`` failed attempts."""
    import urllib.error
    import urllib.request

    last_err: Exception | None = None
    for _ in range(max(retry, 1)):
        try:
            with urllib.request.urlopen(url, timeout=timeout) as rsp:
                # file:// responses carry status None — treat as OK
                status = getattr(rsp, "status", None) or 200
                if 200 <= status < 300:
                    return rsp.read()
                last_err = RuntimeError(f"HTTP {status}")
        except (urllib.error.URLError, OSError) as e:  # incl. timeouts
            last_err = e
    raise RuntimeError(f"download {url} failed") from last_err


def download_to_local_file(url: str, local_path: str, timeout: int = 20,
                           retry: int = 3) -> None:
    """Fetch a URL to a file (parity: misc.py:433-436)."""
    content = download(url, timeout=timeout, retry=retry)
    with open(local_path, "wb") as f:
        f.write(content)
