"""Codebook maintenance transforms: dead-code reassignment.

Parity: codebook.py reAssignCodebook:75-100,345-351 — codewords whose EMA
usage frequency is ~zero get re-seeded from the most-used codewords (with
random selection), applied between epochs as a pure function over
(params, codebook_stats).
"""

import jax
import jax.numpy as jnp

EPS = 1e-7


def reassign_level(codebook, freq, rng):
    """codebook: (m, k, d); freq: (m, k) EMA usage. Returns new codebook."""
    m, k, d = codebook.shape

    def per_group(cb, fr, key):
        dead = fr < EPS
        n_dead = dead.sum()
        order = jnp.argsort(-fr)                  # most-used first
        # pick donors for every slot: the i-th dead slot copies from a
        # randomly chosen member of the top-(k - n_dead) most-used codes
        top_n = jnp.maximum(k - n_dead, 1)
        donor_pos = jax.random.randint(key, (k,), 0, k) % top_n
        donors = cb[order[donor_pos]]
        noise = 1e-3 * jax.random.normal(key, (k, d))
        return jnp.where(dead[:, None], donors + noise, cb)

    keys = jax.random.split(rng, m)
    return jax.vmap(per_group)(codebook, freq, keys)


def reassign_dead_codes(params, codebook_stats, rng,
                        codebook_scope="compressor"):
    """Walk the param tree, reassign every level's dead codewords.

    Returns (new_params, num_dead_total)."""
    new_params = jax.tree.map(lambda x: x, params)
    total_dead = 0
    # locate codebook levels: params[...]["levelN"]["codebook"]
    def walk(ptree, stats, prefix):
        nonlocal new_params, total_dead
        if not isinstance(ptree, dict):
            return
        for k, v in list(ptree.items()):
            if k.startswith("level") and isinstance(v, dict) \
                    and "codebook" in v:
                lv = int(k[len("level"):])
                freq_key = f"freq_ema_{lv}"
                freq = _find_freq(stats, freq_key)
                if freq is None:
                    continue
                dead = int((freq < EPS).sum())
                total_dead += dead
                if dead:
                    sub = _get(new_params, prefix + (k,))
                    # zlib.crc32, not hash(): str hashing is salted per
                    # process, which would make reassignment diverge
                    # across runs and across multi-host replicas
                    import zlib
                    salt = zlib.crc32("/".join(prefix + (k,)).encode())
                    sub["codebook"] = reassign_level(
                        v["codebook"], freq,
                        jax.random.fold_in(rng, salt % (2 ** 31)),
                    )
            elif isinstance(v, dict):
                walk(v, stats, prefix + (k,))

    walk(params, codebook_stats, ())
    return new_params, total_dead


def _find_freq(tree, name):
    if not isinstance(tree, dict):
        return None
    if name in tree:
        return tree[name]
    for v in tree.values():
        if isinstance(v, dict):
            r = _find_freq(v, name)
            if r is not None:
                return r
    return None


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree
