"""Runs the reference's own unit tests against unicycler_tpu.

A fake 'unicycler' package is installed into sys.modules whose submodules
re-export the unicycler_tpu equivalents. The reference test files (loaded
straight from /root/reference/test/) then exercise our implementation —
54 KB of graph assertions become a parity harness with zero porting.
"""

import importlib.util
import sys
import types
import unittest


def install_reference_shim():
    if 'unicycler' in sys.modules:
        return sys.modules['unicycler']

    import unicycler_tpu.graph.assembly_graph as ag_mod
    import unicycler_tpu.graph.gfa as gfa_mod
    import unicycler_tpu.graph.segment as seg_mod
    import unicycler_tpu.io.fastx as fastx_mod
    import unicycler_tpu.log as log_mod
    import unicycler_tpu.misc as misc_mod

    pkg = types.ModuleType('unicycler')

    assembly_graph = types.ModuleType('unicycler.assembly_graph')
    assembly_graph.AssemblyGraph = ag_mod.AssemblyGraph
    assembly_graph.BadPath = ag_mod.BadPath
    assembly_graph.BadOverlaps = ag_mod.BadOverlaps
    assembly_graph.CannotTrimOverlaps = ag_mod.CannotTrimOverlaps
    for name in ('signed_string_to_int', 'int_to_signed_string',
                 'build_reverse_links', 'build_rc_links_if_necessary',
                 'is_link_positive', 'get_sign_string', 'split_path',
                 'split_path_multiple', 'insert_num_in_list',
                 'find_replace_in_list', 'find_replace_one_val_in_list',
                 'value_from_fractional_index'):
        setattr(assembly_graph, name, getattr(gfa_mod, name))

    assembly_graph_segment = types.ModuleType(
        'unicycler.assembly_graph_segment')
    assembly_graph_segment.Segment = seg_mod.Segment

    misc = types.ModuleType('unicycler.misc')
    for name in dir(misc_mod):
        if not name.startswith('_'):
            setattr(misc, name, getattr(misc_mod, name))
    misc.load_fasta = fastx_mod.load_fasta
    misc.load_fasta_with_full_header = fastx_mod.load_fasta_with_full_header

    log = types.ModuleType('unicycler.log')
    log.Log = log_mod.Log
    log.logger = log_mod.logger
    log.log = log_mod.log

    pkg.assembly_graph = assembly_graph
    pkg.assembly_graph_segment = assembly_graph_segment
    pkg.misc = misc
    pkg.log = log

    sys.modules['unicycler'] = pkg
    sys.modules['unicycler.assembly_graph'] = assembly_graph
    sys.modules['unicycler.assembly_graph_segment'] = assembly_graph_segment
    sys.modules['unicycler.misc'] = misc
    sys.modules['unicycler.log'] = log
    return pkg


def add_shim_module(name, **attrs):
    """Register an extra unicycler.<name> submodule on the shim. Merges
    into an already-registered module of the same name: several parity
    files shim overlapping module names with different attribute subsets
    (e.g. unicycler.alignment), and with per-case parametrisation every
    file's shims are installed at collection time before any suite
    runs — the union must satisfy them all."""
    pkg = install_reference_shim()
    mod = sys.modules.get('unicycler.' + name)
    if mod is None:
        mod = types.ModuleType('unicycler.' + name)
    for attr, val in attrs.items():
        setattr(mod, attr, val)
    setattr(pkg, name, mod)
    sys.modules['unicycler.' + name] = mod
    return mod


_TEST_DIR_COPY = None


def reference_test_dir():
    """A /tmp copy of the reference test dir, so reference tests that write
    temp files next to __file__ never touch the read-only reference tree."""
    global _TEST_DIR_COPY
    if _TEST_DIR_COPY is None:
        import os
        import shutil
        import tempfile
        base = tempfile.mkdtemp(prefix='ref_copy_')
        _TEST_DIR_COPY = os.path.join(base, 'test')
        os.makedirs(_TEST_DIR_COPY)
        for name in os.listdir('/root/reference/test'):
            src = '/root/reference/test/' + name
            if os.path.isfile(src):
                shutil.copy(src, _TEST_DIR_COPY)
        # some reference tests read ../sample_data/ relative to the tests
        shutil.copytree('/root/reference/sample_data',
                        os.path.join(base, 'sample_data'))
    return _TEST_DIR_COPY


_MODULE_CACHE = {}


def load_reference_test_module(filename):
    """Load a reference test module (from the /tmp copy); cached so
    discovery and the suite run share one import."""
    if filename in _MODULE_CACHE:
        return _MODULE_CACHE[filename]
    install_reference_shim()
    import os
    path = os.path.join(reference_test_dir(), filename)
    spec = importlib.util.spec_from_file_location(
        'ref_' + filename.replace('.py', ''), path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    _MODULE_CACHE[filename] = module
    return module


def run_reference_tests(filename, expected_failures=()):
    """Run every test in a reference test file; returns (result, skipped)."""
    module = load_reference_test_module(filename)
    loader = unittest.TestLoader()
    suite = loader.loadTestsFromModule(module)
    runner = unittest.TextTestRunner(verbosity=0,
                                     stream=open('/dev/null', 'w'))
    result = runner.run(suite)
    failures = {t.id().split('.')[-1] for t, _ in
                result.failures + result.errors}
    unexpected = failures - set(expected_failures)
    return result, unexpected


# --- per-case parity API (VERDICT r4 ask #6) ------------------------------
#
# A reference file's suite still runs ONCE (setUpClass-style sharing and
# runtime are unchanged), but each reference test becomes an individually
# named pytest case that reports its own traceback on regression:
# discover_reference_test_ids() parametrises, case_outcome() asserts.

_SUITE_RESULTS = {}     # filename -> {case_id: None | failure text}


def discover_reference_test_ids(filename):
    """'Class.method' ids of every test in a reference test file, in
    definition order (collection-time; does not run the suite)."""
    module = load_reference_test_module(filename)
    suite = unittest.TestLoader().loadTestsFromModule(module)
    ids = []

    def walk(s):
        for t in s:
            if isinstance(t, unittest.TestSuite):
                walk(t)
            else:
                ids.append(t.id().split('.', 1)[1])
    walk(suite)
    return ids


class _RecordingResult(unittest.TestResult):
    def __init__(self):
        super().__init__()
        self.outcomes = {}

    def startTest(self, test):
        super().startTest(test)
        self.outcomes[test.id().split('.', 1)[1]] = None

    def addFailure(self, test, err):
        super().addFailure(test, err)
        self.outcomes[test.id().split('.', 1)[1]] = \
            self._exc_info_to_string(err, test)

    def addError(self, test, err):
        super().addError(test, err)
        self.outcomes[test.id().split('.', 1)[1]] = \
            self._exc_info_to_string(err, test)

    def addSkip(self, test, reason):
        super().addSkip(test, reason)
        self.outcomes[test.id().split('.', 1)[1]] = 'SKIPPED: ' + reason


def _suite_outcomes(filename):
    if filename not in _SUITE_RESULTS:
        module = load_reference_test_module(filename)
        suite = unittest.TestLoader().loadTestsFromModule(module)
        result = _RecordingResult()
        suite.run(result)
        _SUITE_RESULTS[filename] = result.outcomes
    return _SUITE_RESULTS[filename]


def case_outcome(filename, case_id):
    """Assert one reference test case passed (the file's suite runs once
    per pytest session; this reports the cached per-case outcome)."""
    outcomes = _suite_outcomes(filename)
    assert case_id in outcomes, \
        '%s did not run case %s' % (filename, case_id)
    failure = outcomes[case_id]
    if failure is not None and failure.startswith('SKIPPED: '):
        import pytest
        pytest.skip(failure[len('SKIPPED: '):])
    assert failure is None, \
        'reference parity case %s::%s failed:\n%s' % (filename, case_id,
                                                      failure)
