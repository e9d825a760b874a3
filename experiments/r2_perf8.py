"""Round-2 perf #8: XLA:TPU compiler-flag sweep on the honest trunk-only
step (98.99 ms baseline from r2_perf2). Each variant runs in a subprocess
because XLA_FLAGS is read at backend init.

Usage: python r2_perf8.py            # driver, runs every variant
       python r2_perf8.py --child    # one measurement (XLA_FLAGS from env)
"""

import json
import os
import subprocess
import sys
import time

VARIANTS = {
    'control': '',
    'vmem64m': '--xla_tpu_scoped_vmem_limit_kib=65536',
    'vmem32m': '--xla_tpu_scoped_vmem_limit_kib=32768',
    'lhs': '--xla_tpu_enable_latency_hiding_scheduler=true',
    'no_multi_level': '--xla_tpu_use_multi_level_buffers=false',
}


def child():
    sys.path.insert(0, '/root/repo')
    sys.path.insert(0, '/root/repo/experiments')
    from r2_perf2 import run_trunk_only   # noqa: E402
    run_trunk_only()


def driver():
    for name, flags in VARIANTS.items():
        env = dict(os.environ)
        if flags:
            env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '') + ' ' + flags).strip()
        t0 = time.perf_counter()
        p = subprocess.run(
            [sys.executable, __file__, '--child'], env=env,
            capture_output=True, text=True, timeout=900)
        out = [l for l in p.stdout.splitlines() if l.startswith('{')]
        print(json.dumps({'variant': name, 'flags': flags,
                          'result': out[-1] if out else None,
                          'rc': p.returncode,
                          'err': p.stderr[-300:] if p.returncode else '',
                          'wall_s': round(time.perf_counter() - t0, 1)}),
              flush=True)


if __name__ == '__main__':
    if '--child' in sys.argv:
        child()
    else:
        driver()
