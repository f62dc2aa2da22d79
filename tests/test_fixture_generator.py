"""Keep the reference-fixture bank machinery ready, not rotting (VERDICT r3
task 7): the generator must still execute (it runs in the reference CUDA
env, so here we can only exercise import + argparse), and every fixture
file/key the gate tests consume must be one the generator actually writes —
so the day real hardware is available the bank fills without a debugging
round."""
import ast
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
GENERATOR = REPO / "scripts" / "make_reference_fixtures.py"
GATE = REPO / "tests" / "test_reference_fixtures.py"


def test_generator_help_executes():
    """`--help` imports the module and runs argparse (kaolin/diffusers
    imports are inside the dump functions, so this must work anywhere)."""
    proc = subprocess.run(
        [sys.executable, "-m", "scripts.make_reference_fixtures", "--help"],
        capture_output=True, text=True, timeout=300, cwd=str(REPO))
    assert proc.returncode == 0, proc.stderr[-1000:]
    assert "--sd-model" in proc.stdout and "--out" in proc.stdout


def _generator_manifest():
    """{filename: set(keys)} for every np.savez in the generator, including
    keys splatted from a dict built as `var[mode] = ...` inside a for loop
    over a constant tuple (dump_texture_mapping)."""
    tree = ast.parse(GENERATOR.read_text())
    manifest = {}
    for fn in [n for n in tree.body if isinstance(n, ast.FunctionDef)]:
        # map: dict-var name → constant keys assigned in loops over constants
        splat_keys = {}
        for node in ast.walk(fn):
            if isinstance(node, ast.For) and isinstance(node.target, ast.Name):
                loop_var = node.target.id
                if isinstance(node.iter, (ast.Tuple, ast.List)) and all(
                        isinstance(e, ast.Constant) for e in node.iter.elts):
                    consts = {e.value for e in node.iter.elts}
                    for sub in ast.walk(node):
                        if (isinstance(sub, ast.Assign)
                                and isinstance(sub.targets[0], ast.Subscript)
                                and isinstance(sub.targets[0].value, ast.Name)
                                and isinstance(sub.targets[0].slice, ast.Name)
                                and sub.targets[0].slice.id == loop_var):
                            splat_keys.setdefault(
                                sub.targets[0].value.id, set()).update(consts)
        for node in ast.walk(fn):
            if not (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "savez"):
                continue
            # first positional arg is `out / "name.npz"`
            arg0 = node.args[0]
            assert isinstance(arg0, ast.BinOp) and isinstance(
                arg0.right, ast.Constant), ast.dump(arg0)
            name = arg0.right.value
            keys = set()
            for kw in node.keywords:
                if kw.arg is not None:
                    keys.add(kw.arg)
                elif isinstance(kw.value, ast.Name):       # **outs
                    keys |= splat_keys.get(kw.value.id, set())
            manifest[name] = keys
    return manifest


def _gate_usage():
    """{filename: set(keys)} consumed per test function in the gate file."""
    tree = ast.parse(GATE.read_text())
    usage = {}
    for fn in [n for n in tree.body if isinstance(n, ast.FunctionDef)
               if n.name.startswith("test_")]:
        loaded = None
        for node in ast.walk(fn):
            if (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
                    and node.func.id == "_load"):
                loaded = node.args[0].value
        if loaded is None:
            continue
        keys = set()
        for node in ast.walk(fn):
            if (isinstance(node, ast.Subscript)
                    and isinstance(node.value, ast.Name)
                    and node.value.id == "fx"
                    and isinstance(node.slice, ast.Constant)):
                keys.add(node.slice.value)
        usage.setdefault(loaded, set()).update(keys)
    return usage


def test_gate_keys_match_generator_manifest():
    manifest = _generator_manifest()
    usage = _gate_usage()
    assert usage, "gate file parsed to nothing — test harness broken"
    for name, keys in usage.items():
        assert name in manifest, (
            f"gate reads {name} but the generator never writes it")
        missing = keys - manifest[name]
        assert not missing, (
            f"gate reads keys {sorted(missing)} from {name} that the "
            f"generator does not write (writes {sorted(manifest[name])})")
