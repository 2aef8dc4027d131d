"""Regenerate PLANS.md (see that file): formatted physical plans of headline
queries at $SPARK_GRAFT_SF_DIR."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# The capture logic lives in the repo history / PLANS.md header; quick manual:
#   python - <<'PY'
#   import __spark_entry__ as em; from hiss_cube_spark import get_spark
#   s = get_spark(); em.queries()["flagship_ml_cube"](s, "/root/testdata/sf0.1").explain("formatted")
#   PY
if __name__ == "__main__":
    print(__doc__)
