"""unicycler_tpu: a TPU-native hybrid bacterial genome assembly framework.

A from-scratch re-design of the capabilities of Unicycler (the reference
hybrid assembler) for TPU hardware: the alignment compute path runs as
batched JAX/Pallas wavefront DP kernels, the assembly-graph pipeline runs
host-side over device-resident sequence tensors, and scaling happens via
jax.sharding meshes rather than thread pools.

Layering (mirrors reference layer map, SURVEY.md §1):
  pipeline/   CLI + orchestrator            (ref unicycler/unicycler.py)
  graph/      assembly + string graphs      (ref assembly_graph.py, string_graph.py)
  bridges/    bridging + path finding       (ref bridge_*.py, path_finding.py)
  asm/        OLC assembler + polish        (ref vendored miniasm + Racon subprocess)
  align/      alignment orchestration       (ref unicycler_align.py, alignment.py)
  ops/        device compute (JAX/Pallas)   (ref C++ SeqAn/minimap via ctypes)
  io/         FASTA/FASTQ/SAM/GFA           (ref read_ref.py, misc.py)
  parallel/   mesh + sharding               (ref: none — single-node threads)
"""

from .version import __version__


def _enable_compilation_cache():
    """Persist XLA/Mosaic compiles across processes: kernel shapes are
    bucketed, so a warmed cache removes nearly all compile latency from
    later runs."""
    import os
    try:
        import jax
        cache_dir = os.environ.get(
            'UNICYCLER_TPU_CACHE',
            os.path.join(os.path.expanduser('~'), '.cache',
                         'unicycler_tpu_xla'))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    except Exception:  # cache is an optimisation only
        pass


_enable_compilation_cache()
