"""Object-naming stage.

Public surface mirrors src/foho/preprocess/gemini_objname.py:38-77: append
(image_id, image_path, response) rows to a CSV. Uses the Gemini API when
GEMINI_API_KEY is set and the network is reachable (model + prompt match the
reference: gemini-2.5-flash-lite, "What is the person holding..."); otherwise
falls back to the split CSV's object column when present, else the generic
"object" (the downstream segmenter treats the name as a text prompt only).
"""

from __future__ import annotations

import argparse
import csv
import os
from typing import List, Optional, Tuple

PROMPT = (
    "What is the person holding in the image? Answer with the object name only."
)
MODEL = "gemini-2.5-flash-lite"


def _read_split(split_path: str) -> List[Tuple[str, str, Optional[str]]]:
    rows = []
    with open(split_path, "r", encoding="utf-8") as f:
        reader = csv.DictReader(f)
        for row in reader:
            obj = row.get("object") or row.get("obj_name")
            rows.append((row["img_id"], row["img_path"], obj))
    return rows


def _query_gemini(image_path: str) -> Optional[str]:
    api_key = os.environ.get("GEMINI_API_KEY")
    if not api_key:
        return None
    try:  # pragma: no cover - network-dependent
        import google.generativeai as genai

        genai.configure(api_key=api_key)
        model = genai.GenerativeModel(MODEL)
        from PIL import Image

        resp = model.generate_content([PROMPT, Image.open(image_path)])
        return resp.text.strip()
    except Exception as e:
        print(f"Gemini query failed ({e}); falling back")
        return None


def run(out_csv: str, split_path: Optional[str] = None,
        image_path: Optional[str] = None) -> None:
    if split_path:
        items = _read_split(split_path)
    elif image_path:
        stem = os.path.splitext(os.path.basename(image_path))[0]
        items = [(stem, image_path, None)]
    else:
        raise ValueError("Provide split_path or image_path")

    done = set()
    if os.path.exists(out_csv):
        with open(out_csv, "r", encoding="utf-8") as f:
            done = {row[0] for row in csv.reader(f) if row}

    os.makedirs(os.path.dirname(os.path.abspath(out_csv)), exist_ok=True)
    with open(out_csv, "a", encoding="utf-8", newline="") as f:
        writer = csv.writer(f)
        for image_id, path, obj in items:
            if image_id in done:  # incremental append (gemini_objname.py:62-64)
                continue
            name = _query_gemini(path) or obj or "object"
            writer.writerow([image_id, path, name])
            print(f"{image_id}: {name}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out_csv", required=True)
    parser.add_argument("--split_path", default=None)
    parser.add_argument("--image_path", default=None)
    args = parser.parse_args()
    run(args.out_csv, args.split_path, args.image_path)


if __name__ == "__main__":
    main()
