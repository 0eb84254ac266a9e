"""In-repo test asset locations.

The repo is self-contained: the six CommonRoad scenario XMLs live in
``scenarios/``, schema-identical configs in ``configs/`` (values verified
equal to the reference's ``test/config_files/*.yaml``), and the reference's
committed golden measurement files are mirrored under
``tests/ref_goldens/`` (reference source: ``test/2D_plots_*/{planned
states,control inputs,solve time,deviation,RMSD}.txt``).

Set ``MPC_TPU_REF`` to a reference checkout to point parity tests at the
original artifacts instead of the in-repo mirrors.
"""
import os

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

_REF = os.environ.get("MPC_TPU_REF", "")

#: directory with the CommonRoad scenario XMLs
SCN = os.path.join(_REF, "scenarios") if _REF else os.path.join(REPO, "scenarios")
#: directory with the planner config YAMLs (reference schema)
CFG = (os.path.join(_REF, "test", "config_files") if _REF
       else os.path.join(REPO, "configs"))
#: directory holding the reference's golden artifact dirs (2D_plots_*)
GOLD = os.path.join(_REF, "test") if _REF else os.path.join(HERE, "ref_goldens")


def config(name: str) -> str:
    return os.path.join(CFG, name)


def scenario(name: str) -> str:
    return os.path.join(SCN, name)


def golden(dirname: str, fname: str = "planned states.txt") -> str:
    return os.path.join(GOLD, dirname, fname)
