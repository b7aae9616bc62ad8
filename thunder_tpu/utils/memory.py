"""Memory probes — the reference's RSS check (memoryCheckRM
include/Utils.h:23, src/Utils.cpp) and CHECK_MEMORY_USAGE macro
(include/Parallel.h:106-112), extended with the device-side HBM view the
TPU runtime exposes."""

from .logging import get_logger


def host_rss_mb():
    """Resident set size of this process in MB (memoryCheckRM parity:
    the reference greps VmRSS from /proc/self/status)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return float("nan")


def device_memory_stats(device=None):
    """Per-device allocator stats (bytes) when the backend exposes them;
    {} otherwise (CPU does not)."""
    import jax

    dev = device if device is not None else jax.local_devices()[0]
    try:
        return dev.memory_stats() or {}
    except Exception:
        return {}


def check_memory_usage(tag=""):
    """CHECK_MEMORY_USAGE parity: log host RSS (+ device HBM when
    available) to LOGGER_MEM."""
    log = get_logger("MEM")
    stats = device_memory_stats()
    extra = ""
    if "bytes_in_use" in stats:
        extra = f", device {stats['bytes_in_use'] / 1e6:.0f} MB in use"
        if "peak_bytes_in_use" in stats:
            extra += f" (peak {stats['peak_bytes_in_use'] / 1e6:.0f} MB)"
    log.info("%sRSS %.0f MB%s", f"{tag}: " if tag else "", host_rss_mb(),
             extra)
    return stats
