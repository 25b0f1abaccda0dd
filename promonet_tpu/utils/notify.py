"""Job completion/failure notifications.

Replaces the reference's @torchutil.notify decorators (promonet/train/
core.py:16, data/download/core.py:39, evaluate/core.py:41 — Apprise
webhooks). Zero-egress by default: notifications go to a local JSONL
log, and additionally to a webhook URL when PROMONET_NOTIFY_URL is set.
"""
import functools
import json
import os
import time
import traceback
from pathlib import Path


def notify(name):
    """Decorator: record start/completion/failure of a long-running job"""

    def decorator(fn):

        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            _emit(name, 'started')
            start = time.time()
            try:
                result = fn(*args, **kwargs)
            except Exception as error:
                _emit(
                    name,
                    'failed',
                    seconds=time.time() - start,
                    error=''.join(
                        traceback.format_exception_only(error)).strip())
                raise
            _emit(name, 'completed', seconds=time.time() - start)
            return result

        return wrapped

    return decorator


def _emit(name, status, **extra):
    record = {'job': name, 'status': status, 'time': time.time(), **extra}

    # Local log
    import promonet_tpu
    try:
        log_dir = Path(promonet_tpu.RUNS_DIR)
        log_dir.mkdir(parents=True, exist_ok=True)
        with open(log_dir / 'notifications.jsonl', 'a') as file:
            file.write(json.dumps(record) + '\n')
    except Exception:
        pass

    # Optional webhook
    url = os.environ.get('PROMONET_NOTIFY_URL')
    if url:
        try:
            import urllib.request
            request = urllib.request.Request(
                url,
                data=json.dumps(record).encode(),
                headers={'Content-Type': 'application/json'})
            urllib.request.urlopen(request, timeout=5)
        except Exception:
            pass
