"""TPU measurement: fusion-tree permute plans, per-entry vs grouped GEMMs.

One process, one axon claim; retries the first device touch while a previous
(killed) client's claim drains. Results go to /tmp/su2_grouped.json.
"""

import json
import sys
import time

sys.path.insert(0, '/root/repo')

RESULTS = {}


def main():
    import jax

    for attempt in range(40):
        try:
            jax.devices()
            break
        except Exception as e:
            print(f'claim not ready ({e}); retry in 30 s', flush=True)
            time.sleep(30)
    print('devices:', jax.devices(), flush=True)

    from cyten_tpu.config import config
    from bench import su2_run

    for cm in (128, 256, 512):
        t0 = time.time()
        config.fusion_tree_grouped_apply = False
        t_off, _ = su2_run(cm, lengths=(5, 25), skip_numpy=True)
        config.fusion_tree_grouped_apply = True
        t_on, _ = su2_run(cm, lengths=(5, 25), skip_numpy=True)
        config.fusion_tree_grouped_apply = None
        RESULTS[f'su2_{cm}'] = {
            'per_entry_ms': round(t_off * 1e3, 4),
            'grouped_ms': round(t_on * 1e3, 4),
            'speedup': round(t_off / t_on, 3),
            'wall': round(time.time() - t0, 1)}
        print(f'su2 {cm}: {RESULTS[f"su2_{cm}"]}', flush=True)
        with open('/tmp/su2_grouped.json', 'w') as f:
            json.dump(RESULTS, f, indent=1)
    print('DONE', flush=True)


if __name__ == '__main__':
    main()
