"""Multi-stage view-optimization sweep machinery.

Behavioral port of /root/reference/acquisition_focus/running/stages.py:5-89: one
``opt_view{i}`` stage per base view (optimize the current view, freeze previous), then
a final ``ref`` stage with fixed views; stage-to-stage key inheritance; checkpoint
chaining through the ``save_path`` -> ``transform_model_checkpoint_path`` hand-off.
"""

import collections.abc


class Stage(dict):
    def __init__(self, **kwargs):
        activate = kwargs.pop('activate_fn', None)
        super().__init__(**kwargs)
        self._activate_fn = activate or (lambda stage: None)

    def activate(self):
        self._activate_fn(self)


class StageIterator(collections.abc.Iterator):
    """Iterates stages; every key of the previous stage is inherited by the next
    unless overridden (reference stages.py:15-32)."""

    def __init__(self, stages, verbose=False):
        self.stages = stages
        self.stage_keys = list(stages.keys())
        self.current = None
        self.current_key = None
        self.idx = -1
        self.len = len(stages)
        self.verbose = verbose

    def __next__(self):
        if self.current is None:
            self.current_key = self.stage_keys.pop(0)
            self.current = self.stages[self.current_key]
        else:
            if not self.stage_keys:
                raise StopIteration()
            nxt_key = self.stage_keys.pop(0)
            nxt = self.stages[nxt_key]
            for key, value in self.current.items():
                if key not in nxt:
                    nxt[key] = value
            self.current_key = nxt_key
            self.current = nxt
        self.idx += 1
        if self.verbose:
            print(f"Opening stage '{self.current_key}' ({self.idx + 1}/{self.len})")
        return self.current


def _chain_previous_transform_checkpoint(stage):
    # Promote the previous stage's best save into this stage's transform checkpoint:
    # this is how view k's learned orientation is frozen into stage k+1
    # (reference stages.py:53-54, written back by run_dl.py:701-702).
    stage['transform_model_checkpoint_path'] = stage.get('save_path')


def get_std_stages(config):
    """Standard sweep: opt_view{0..V-1} then 'ref' (reference stages.py:58-89)."""
    std_stages = {}
    n_views = len(config['base_views'])

    for view_idx in range(n_views):
        std_stages[f'opt_view{view_idx}'] = Stage(
            view_optimization_mode='opt-current-fix-previous',
            epochs=int(config['epochs']),
            use_affine_theta=True,
            do_output=True,
            n_active_views=view_idx + 1,
            activate_fn=_chain_previous_transform_checkpoint if view_idx > 0 else None,
        )

    # note: 'ref' deliberately has no activate_fn — it inherits the transform
    # checkpoint key as-is (reference stages.py:76-82); with use_affine_theta=False
    # the ATM weights are unused there anyway.
    std_stages['ref'] = Stage(
        do_output=True,
        view_optimization_mode='opt-none',
        epochs=config['epochs'],
        use_affine_theta=False,
        n_active_views=n_views,
    )

    if config.get('stage_override') is not None:
        selected = {k: v for k, v in std_stages.items()
                    if config['stage_override'] == k}
    else:
        selected = std_stages
    return StageIterator(selected, verbose=True)
