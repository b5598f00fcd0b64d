"""STAMP adapter loss (parity: opencood/loss/adapter_loss.py:14-48).

Three alpha-weighted MSE terms tie the adapter/reverter pair to the
protocol feature space:
  P2M   = MSE(FM, FP2M)     — reverted protocol features look local
  M2P2M = MSE(FM, FM2P2M)   — adapter∘reverter cycle consistency
  M2P   = MSE(FP, FM2P)     — adapted local features look protocol
"""

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AdapterLossCfg:
    alpha_p2m: float = 1.0
    alpha_m2p2m: float = 1.0
    alpha_m2p: float = 1.0


def adapter_loss(fm, fp2m, fm2p2m, fp, fm2p,
                 cfg: AdapterLossCfg = AdapterLossCfg()
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """The five-feature STAMP objective (train_stamp.py:188-191)."""
    p2m = jnp.mean((fm - fp2m) ** 2)
    m2p2m = jnp.mean((fm - fm2p2m) ** 2)
    m2p = jnp.mean((fp - fm2p) ** 2)
    total = (cfg.alpha_p2m * p2m + cfg.alpha_m2p2m * m2p2m
             + cfg.alpha_m2p * m2p)
    return total, {"p2m": p2m, "m2p2m": m2p2m, "m2p": m2p,
                   "adapter_loss": total}
