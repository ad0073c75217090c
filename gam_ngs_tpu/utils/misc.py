"""Small host utilities mirroring the reference's UtilityFunctions.

Reference: /root/reference/lib/src/UtilityFunctions.cc
"""

import resource


def format_time(seconds: int) -> str:
    """Format seconds as the reference's formatTime (UtilityFunctions.cc:53)."""
    seconds = int(seconds)
    h = seconds // 3600
    m = (seconds % 3600) // 60
    s = (seconds % 3600) % 60
    out = ""
    if h > 0:
        out += f"{h}h"
    if m > 0:
        out += f"{m}m"
    out += f"{s}s"
    return out


def get_max_rss_kb() -> int:
    """Peak RSS in KiB (reference reads /proc status; getrusage is equivalent)."""
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss


def path_basename(path: str) -> str:
    """getPathBaseName (UtilityFunctions.cc:40)."""
    found = path.rfind("/")
    return path[found + 1:] if found != -1 else path
