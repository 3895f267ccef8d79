"""Command-line flag surface (ref: point_vs/parse_args.py, all ~60 flags).

The names, defaults and help semantics match the reference so existing
PointVS invocations port directly; TPU-specific additions are grouped at
the bottom (--num_devices, --cache_dir, --bf16, --profile).
"""
from __future__ import annotations

import argparse


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('model', type=str,
                        help='Point cloud network: lucid, egnn or multitask')
    parser.add_argument('save_path', type=str,
                        help='Directory for experiment outputs')
    parser.add_argument('--train_data_root_pose', type=str,
                        help='Root for pose-training parquets')
    parser.add_argument('--train_data_root_affinity', '--tdra', type=str,
                        help='Root for affinity-training parquets')
    parser.add_argument('--test_data_root_pose', type=str,
                        help='Root for pose-test parquets')
    parser.add_argument('--test_data_root_affinity', type=str,
                        help='Root for affinity-test parquets')
    parser.add_argument('--logging_level', type=str, default='info')
    parser.add_argument('--load_weights', '-l', type=str, required=False,
                        help='Load a model checkpoint (orbax dir, or a '
                             'reference-trained PointVS .pt file)')
    parser.add_argument('--import_torch_weights', type=str,
                        help='Import a reference-trained PointVS torch '
                             'checkpoint (.pt; legacy key schemas '
                             'included) onto this model')
    parser.add_argument('--translated_actives', type=str)
    parser.add_argument('--batch_size', '-b', type=int, default=32)
    parser.add_argument('--epochs_pose', '-ep', type=int, default=0)
    parser.add_argument('--epochs_affinity', '-ea', type=int, default=0)
    parser.add_argument('--channels', '-k', type=int, default=32)
    parser.add_argument('--learning_rate', '-lr', type=float, default=0.002)
    parser.add_argument('--weight_decay', '-w', type=float, default=1e-4)
    parser.add_argument('--wandb_project', type=str)
    parser.add_argument('--wandb_run', type=str)
    parser.add_argument('--layers', type=int, default=6)
    parser.add_argument('--radius', type=int, default=10,
                        help='Pocket box radius (Angstrom)')
    parser.add_argument('--load_args', type=str,
                        help='YAML file of args overriding the command line')
    parser.add_argument('--double', action='store_true',
                        help='64-bit floats (enables jax x64)')
    parser.add_argument('--activation', type=str, default='relu')
    parser.add_argument('--dropout', type=float, default=0.0)
    parser.add_argument('--use_1cycle', action='store_true')
    parser.add_argument('--warm_restarts', action='store_true')
    parser.add_argument('--fourier_features', type=int, default=0)
    parser.add_argument('--norm_coords', action='store_true')
    parser.add_argument('--norm_feats', action='store_true')
    parser.add_argument('--use_atomic_numbers', action='store_true')
    parser.add_argument('--compact', action='store_true')
    parser.add_argument('--thin_mlps', action='store_true')
    parser.add_argument('--hydrogens', action='store_true')
    parser.add_argument('--augmented_actives', type=int, default=0)
    parser.add_argument('--min_aug_angle', type=float, default=30)
    parser.add_argument('--max_active_rmsd', type=float)
    parser.add_argument('--min_inactive_rmsd', type=float)
    parser.add_argument('--max_inactive_rmsd', type=float)
    parser.add_argument('--val_on_epoch_end', '-v', action='store_true')
    parser.add_argument('--synth_pharm', '-p', action='store_true')
    parser.add_argument('--input_suffix', '-s', type=str, default='parquet')
    parser.add_argument('--train_types_pose', type=str)
    parser.add_argument('--train_types_affinity', type=str)
    parser.add_argument('--test_types_pose', type=str)
    parser.add_argument('--test_types_affinity', type=str)
    parser.add_argument('--egnn_attention', action='store_true')
    parser.add_argument('--egnn_tanh', action='store_true')
    parser.add_argument('--egnn_normalise', action='store_true')
    parser.add_argument('--egnn_residual', action='store_true')
    parser.add_argument('--edge_radius', type=float, default=4.0)
    parser.add_argument('--end_flag', action='store_true')
    parser.add_argument('--wandb_dir', type=str)
    parser.add_argument('--estimate_bonds', action='store_true')
    parser.add_argument('--prune', action='store_true')
    parser.add_argument('--top1', action='store_true')
    parser.add_argument('--graphnorm', action='store_true')
    parser.add_argument('--strict_graphnorm', action='store_true',
                        help='reference-exact GraphNorm: whole-batch '
                             'statistics (the reference always calls pyg '
                             'GraphNorm with batch=None), so predictions '
                             'depend on batch composition; default is '
                             'per-graph masked statistics')
    parser.add_argument('--multi_fc', action='store_true')
    parser.add_argument('--lucid_node_final_act', action='store_true')
    parser.add_argument('--p_remove_entity', type=float, default=0)
    parser.add_argument('--static_coords', action='store_true')
    parser.add_argument('--permutation_invariance', action='store_true')
    parser.add_argument('--node_attention', action='store_true')
    parser.add_argument('--attention_activation_function', type=str,
                        default='sigmoid')
    parser.add_argument('--only_save_best_models', action='store_true')
    parser.add_argument('--egnn_edge_residual', action='store_true')
    parser.add_argument('--gated_residual', action='store_true')
    parser.add_argument('--rezero', action='store_true')
    parser.add_argument('--extended_atom_types', action='store_true')
    parser.add_argument('--model_task', type=str, default='classification',
                        help='classification, regression, multi_regression '
                             'or both')
    parser.add_argument('--synthpharm', action='store_true')
    parser.add_argument('--p_noise', type=float, default=-1)
    parser.add_argument('--include_strain_info', action='store_true')
    parser.add_argument('--final_softplus', action='store_true')
    parser.add_argument('--optimiser', '-o', type=str, default='adam')
    parser.add_argument('--multi_target_affinity', action='store_true')
    parser.add_argument('--regression_loss', type=str, default='mse')
    parser.add_argument('--softmax_attention', action='store_true')
    # Attention-placement switches (multitask, ref egnn_multitask.py:96-122)
    parser.add_argument('--node_attention_final_only', action='store_true')
    parser.add_argument('--edge_attention_final_only', action='store_true')
    parser.add_argument('--node_attention_first_only', action='store_true')
    parser.add_argument('--edge_attention_first_only', action='store_true')

    # --- TPU-native additions ---
    parser.add_argument('--num_devices', type=int, default=None,
                        help='Devices in the data-parallel mesh '
                             '(default: all)')
    parser.add_argument('--cache_dir', type=str, default=None,
                        help='On-disk cache for preprocessed graphs')
    parser.add_argument('--prefetch', type=int, default=2,
                        help='Batches prefetched by the loader thread')
    parser.add_argument('--seed', type=int, default=2)
    parser.add_argument('--profile', action='store_true',
                        help='Write a jax.profiler trace of a few steps')
    parser.add_argument('--debug_nans', action='store_true',
                        help='Enable jax debug_nans (errors at the first '
                             'NaN-producing op instead of the loss guard)')
    parser.add_argument('--no_scan_layers', action='store_true',
                        help='Disable nn.scan layer-stacking (stacked '
                             '[L, ...] param leaves; measured 14x faster '
                             'full training step at 12 layers on v5e). '
                             'Checkpoints are layout-specific, so use '
                             'this only to load pre-scan checkpoints')
    parser.add_argument('--bf16', action='store_true',
                        help='bfloat16 feature-path activations (params, '
                             'geometry, head and loss stay f32): halves '
                             'activation memory for DEEP configs (e.g. '
                             '48 layers). bf16 features bitcast-pack '
                             'into the fused f32 gathers so the fast '
                             'path is preserved (D2H-fenced 1.04x at '
                             '12L/K=32 — roughly speed-neutral; the step '
                             'is aggregation/HBM-bound, not MLP-bound); '
                             'EGNN family only (ignored by other models)')
    parser.add_argument('--remat', action='store_true',
                        help='Rematerialise each EGNN layer in backward '
                             '(jax.checkpoint): O(depth) activation memory '
                             'for deep (e.g. 48-layer) configs')
    parser.add_argument('--graph_shard', type=int, default=1,
                        help='Edge parallelism: split each graph\'s edge '
                             'arrays over this many devices (a 2-D dp x '
                             'gp mesh; num_devices must be divisible by '
                             'it). For complexes whose edge tensors '
                             'exceed one device\'s memory; EGNN/lucid/'
                             'EnTransformer models only')
    parser.add_argument('--multihost', action='store_true',
                        help='Initialise jax.distributed for multi-host '
                             '(DCN) training; data is sharded by process '
                             'index and gradients all-reduce over the '
                             'global mesh. Pin --node_bucket/'
                             '--edge_bucket so every process pads to '
                             'the same static shapes')
    parser.add_argument('--node_bucket', type=int, default=None,
                        help='Pin the padded node count per device batch '
                             'to ONE static shape instead of the bucket '
                             'grid (required for --multihost: processes '
                             'cannot negotiate per-batch shapes)')
    parser.add_argument('--edge_bucket', type=int, default=None,
                        help='Pin the padded edge count per device batch '
                             '(see --node_bucket)')
    parser.add_argument('--scatter_cap', type=int, default=None,
                        help='Pin the windowed-scatter capacity to ONE '
                             'value instead of the loader-measured '
                             'per-batch cap. Required to keep the '
                             'dynamic-capacity speedup under --multihost '
                             '(processes cannot negotiate caps); must '
                             'cover the densest batch window (see '
                             'data/buckets.batch_scatter_cap). Batches '
                             'exceeding it abort with a clear error')
    parser.add_argument('--device_cache', default='auto',
                        choices=('auto', 'on', 'off'),
                        help='Device-resident dataset: upload the whole '
                             'featurised dataset to HBM once and collate '
                             'batches on device from sampled item ids '
                             '(~128 B/step H2D instead of the packed '
                             'wire batch). auto = when the dataset is '
                             'eligible (no augmented actives / p_noise / '
                             'p_remove_entity) and fits '
                             'POINTVS_DD_BUDGET_MB (default 2048). '
                             'Per-epoch random rotation moves on-device')
    return parser.parse_args(argv)


def model_kwargs_from_args(args, dim_input: int) -> dict:
    """Flag soup -> model kwargs (ref point_vs.py:189-221)."""
    regression_task = ('multi_regression'
                       if (args.multi_target_affinity
                           or args.model_task == 'multi_regression')
                       else 'regression')
    # Note: the reference's --activation flag never reaches the EGNN layers
    # (build_net swallows 'act' in **kwargs and uses SiLU); we preserve that
    # by not forwarding it.
    return {
        'k': args.channels,
        'num_layers': args.layers,
        'dropout': args.dropout,
        'dim_input': dim_input,
        'dim_output': 3 if regression_task == 'multi_regression' else 1,
        'norm_coords': args.norm_coords,
        'norm_feats': args.norm_feats,
        'thin_mlps': args.thin_mlps,
        'edge_attention': args.egnn_attention,
        'attention': args.egnn_attention,
        'tanh': args.egnn_tanh,
        'normalize': args.egnn_normalise,
        'residual': args.egnn_residual,
        'edge_residual': args.egnn_edge_residual,
        'graphnorm': args.graphnorm,
        'graphnorm_whole_batch': getattr(args, 'strict_graphnorm', False),
        'multi_fc': args.multi_fc,
        'update_coords': not args.static_coords,
        'node_final_act': args.lucid_node_final_act,
        'permutation_invariance': args.permutation_invariance,
        'attention_activation_fn': args.attention_activation_function,
        'node_attention': args.node_attention,
        'node_attention_final_only': args.node_attention_final_only,
        'edge_attention_final_only': args.edge_attention_final_only,
        'node_attention_first_only': args.node_attention_first_only,
        'edge_attention_first_only': args.edge_attention_first_only,
        'gated_residual': args.gated_residual,
        'rezero': args.rezero,
        'model_task': args.model_task,
        'include_strain_info': args.include_strain_info,
        'final_softplus': args.final_softplus,
        'softmax_attention': args.softmax_attention,
        'fourier_features': args.fourier_features,
        'remat': args.remat,
        'bf16': args.bf16,
        # scan_layers needs a uniform layer stack: the multitask
        # first/final-only attention switches make layers heterogeneous.
        'scan_layers': not args.no_scan_layers and not (
            getattr(args, 'node_attention_final_only', False)
            or getattr(args, 'edge_attention_final_only', False)
            or getattr(args, 'node_attention_first_only', False)
            or getattr(args, 'edge_attention_first_only', False)),
    }
