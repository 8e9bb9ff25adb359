"""Mixed-precision north-star step on the real TPU: bf16 MPO environments
(DMRGEngine(env_dtype=bfloat16), DESIGN.md §10) vs f32, full static-mode bond
update, slope-timed. One process = one axon claim; items individually guarded,
partial results persist to /tmp/bf16_step_results.json.
"""

import json
import sys
import time
import traceback

sys.path.insert(0, '/root/repo')

RESULTS = {}


def log(*a):
    print(*a, flush=True)


def save():
    with open('/tmp/bf16_step_results.json', 'w') as f:
        json.dump(RESULTS, f, indent=1)


def run_item(name, fn):
    t0 = time.time()
    try:
        RESULTS[name] = fn()
        RESULTS[name]['wall'] = round(time.time() - t0, 1)
        log(f'{name}: {RESULTS[name]}')
    except Exception as e:
        RESULTS[name] = {'error': f'{type(e).__name__}: {e}'}
        log(f'{name} FAILED: {e}')
        traceback.print_exc()
    save()


def main():
    import jax

    log('devices:', jax.devices())
    from bench import step_run

    def step(chi, env_dtype, lengths=(2, 6), precision='float32'):
        def fn():
            t, fl = step_run(chi, n_lanczos=10, svd_mode='steady',
                             lengths=lengths, precision=precision,
                             env_dtype=env_dtype)
            return {'ms': round(t * 1e3, 3),
                    'tflops': round(fl / t / 1e12, 3)}
        return fn

    for chi, lengths in ((1024, (2, 6)), (4096, (2, 6)), (8192, (2, 4))):
        run_item(f'step_steady_{chi}_bf16env', step(chi, 'bfloat16', lengths))
        # paired f32 control in the same process/claim (cross-checks the
        # round-2 sweep numbers)
        run_item(f'step_steady_{chi}_f32env', step(chi, None, lengths))
    log('ALL DONE')


if __name__ == '__main__':
    main()
