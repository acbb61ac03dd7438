"""Start the HTTP serving daemon — thin shim over the packaged CLI.

Equivalent to the ``dfol-vqa-serve`` console script
(dfol_vqa_tpu/http_frontend.py:main):

  python scripts/http_serve.py --tiny --port 8787          # CPU demo
  python scripts/http_serve.py --tpu --port 8787 \
      --ckpt runs/exp1 --ckpt-name best --artifact ART     # real weights,
                                                           # AOT set, no traces
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dfol_vqa_tpu.http_frontend import main  # noqa: E402

if __name__ == "__main__":
    main()
