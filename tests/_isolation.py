"""Subprocess isolation for heavy full-pipeline test modules.

XLA's compiler abort()s the whole process when compiling a large program in
an interpreter that has already compiled much of the suite (observed six
times: in executable serialize, deserialize, AND backend_compile — always
on the biggest program that runs late in the session, never when the same
module runs alone; RAM/disk were fine and RLIMIT_MEMLOCK is pinned at 8 MB
in this container).  Until the jaxlib bug is fixed, the few modules that
compile whole-pipeline scans run their tests in a pristine subprocess: the
parent suite executes one wrapper test per module that re-invokes pytest on
the module file with a marker env var; inside the child the real tests run,
in the parent they skip.
"""
import os
import subprocess
import sys

import pytest


def isolate_module(file: str, flag: str):
    """Returns (in_child, child_only_marker, wrapper_test_fn).

    Usage in a test module:

        _IN_CHILD, _child_only, test_module_in_subprocess = isolate_module(
            __file__, "MSCKF_FOO_CHILD")

        @_child_only
        def test_real_thing(): ...
    """
    in_child = os.environ.get(flag) == "1"
    mark = pytest.mark.skipif(
        not in_child,
        reason=f"runs inside the {flag} subprocess (XLA aborts compiling "
        "large programs in a heavily-used process)",
    )

    def wrapper():
        if in_child:
            pytest.skip("already isolated")
        env = dict(os.environ, **{flag: "1"})
        path = os.path.abspath(file)
        r = subprocess.run(
            [sys.executable, "-m", "pytest", path, "-q"],
            env=env,
            capture_output=True,
            text=True,
            timeout=1800,
            cwd=os.path.dirname(os.path.dirname(path)),
        )
        assert r.returncode == 0, (
            f"isolated module {os.path.basename(path)} failed "
            f"(rc={r.returncode}):\n{r.stdout[-4000:]}\n{r.stderr[-2000:]}"
        )

    return in_child, mark, wrapper
