"""Training observability: wandb when available, JSONL artefact always.

The reference logged per-batch loss/lr/examples-seen/mean-prediction stats
to wandb (point_neural_network_base.py:431-468). wandb is optional here
(import-gated); every record is also appended to <save_path>/metrics.jsonl
so runs are inspectable without external services.
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, save_path, wandb_project: Optional[str] = None,
                 wandb_run: Optional[str] = None,
                 wandb_dir=None, config: Optional[Dict[str, Any]] = None):
        self.save_path = Path(save_path)
        self.jsonl_path = self.save_path / 'metrics.jsonl'
        self._wandb = None
        if wandb_project:
            try:
                import wandb
                wandb.init(project=wandb_project,
                           dir=str(wandb_dir or save_path),
                           config=config or {}, allow_val_change=True)
                if wandb_run:
                    wandb.run.name = wandb_run
                self._wandb = wandb
            except ImportError:
                pass

    def log(self, record: Dict[str, Any]):
        record = {k: (float(v) if hasattr(v, 'item') else v)
                  for k, v in record.items()}
        record['_time'] = time.time()
        try:
            with open(self.jsonl_path, 'a', encoding='utf-8') as f:
                f.write(json.dumps(record) + '\n')
        except OSError:
            pass
        if self._wandb is not None:
            try:
                self._wandb.log(record)
            except Exception:
                pass

    def finish(self):
        if self._wandb is not None:
            try:
                self._wandb.finish()
            except Exception:
                pass
