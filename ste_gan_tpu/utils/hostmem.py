"""Host memory accounting shared by every long-lived process.

Exists because some PJRT transports leak host memory per H2D transfer
(the remote-TPU tunnel client here retains every transferred buffer for
the life of the process — measured ~4 MB leaked per 4 MB ``device_put``,
unreclaimable by ``jax.clear_caches`` — and dispatch latency grows with
RSS), so trainers AND servers must bound their own process lifetime.
Consumers: the GAN trainer's watchdog (``train/train_gan.py``,
``TrainConfig.host_rss_restart_gb``) and the serving watchdog
(``serve.py --host_rss_restart_gb``).
"""
from __future__ import annotations


def host_rss_gb() -> float:
    """Resident set size of this process in GiB (0.0 where unsupported)."""
    try:
        with open("/proc/self/status") as fh:
            for line in fh:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / (1024 ** 2)
    except OSError:
        pass
    return 0.0
