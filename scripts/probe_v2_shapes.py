"""Probe round-12 candidate v2 shapes against the in-process reference
(memory: PROBE before generating). Each shape runs launch_v2 once and
prints the emitted TSVs, so unrunnable shapes are excluded from the fuzz
generator and real semantics are modeled first.

Usage: python scripts/probe_v2_shapes.py [shape ...]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.test_v2_reference_parity import _run_reference_v2  # noqa: E402

DEMO = "pid,sex,dob,eth\np001,M,1980-01-02,e0\np002,F,1999-12-31,e1\np003,X,2001-06-15,e0\n"
OBS = (
    "pid,when,when2,code,val\n"
    "p001,2020-01-01 10:00:00,2021-02-02,v1,12\n"
    "p002,2020-03-04,2021-05-06 08:09:10,v2,34\n"
    "p003,bad-date,2021-07-08,v1,56\n"
    "ghost,2020-09-09,2021-09-09,v2,78\n"
)

PID = {"source_field": "pid", "dest_field": "person_id"}
PERSON_MAP = {
    "person_id_mapping": PID,
    "date_mapping": {"source_field": "dob", "dest_field": ["birth_datetime"]},
    "concept_mappings": {
        "sex": {
            "M": {"gender_concept_id": [8507]},
            "F": {"gender_concept_id": [8532]},
            "original_value": ["gender_source_value"],
        }
    },
}
OBS_CM = {
    "code": {
        "v1": {"observation_concept_id": [9010]},
        "v2": {"observation_concept_id": [9020]},
        "original_value": ["observation_source_value"],
    }
}


def run(name: str, cdm: dict, extra_files: dict | None = None) -> None:
    d = Path(tempfile.mkdtemp(prefix=f"probe_{name}_"))
    try:
        inputs = d / "inputs"
        inputs.mkdir()
        (inputs / "demo.csv").write_text(DEMO)
        (inputs / "obs.csv").write_text(OBS)
        for fn, content in (extra_files or {}).items():
            (inputs / fn).write_text(content)
        rules = d / "rules.json"
        rules.write_text(
            json.dumps(
                {"metadata": {"date_created": "2026-01-01T00:00:00", "dataset": name}, "cdm": cdm},
                indent=1,
            )
        )
        out = d / "out"
        out.mkdir()
        print(f"\n================ {name} ================")
        try:
            _run_reference_v2(rules, inputs, out, "demo")
        except BaseException as e:  # noqa: BLE001
            print(f"REFERENCE FAILED: {type(e).__name__}: {str(e)[:400]}")
            return
        for f in sorted(out.glob("*.tsv")):
            if f.name == "summary_mapstream.tsv":
                continue
            body = f.read_text()
            if body.count("\n") <= 1:
                continue
            print(f"--- {f.name} ---")
            print(body, end="")
    finally:
        shutil.rmtree(d, ignore_errors=True)


SHAPES = {}

# P1: measurement maps obs.csv with pid but NO date_mapping; observation full.
SHAPES["p1_no_date_mapping"] = {
    "person": {"demo.csv": PERSON_MAP},
    "measurement": {
        "obs.csv": {
            "person_id_mapping": PID,
            "concept_mappings": {
                "code": {"v1": {"measurement_concept_id": [3001]},
                          "original_value": ["measurement_source_value"]}
            },
        }
    },
    "observation": {
        "obs.csv": {
            "person_id_mapping": PID,
            "date_mapping": {"source_field": "when", "dest_field": ["observation_datetime"]},
            "concept_mappings": OBS_CM,
        }
    },
}

# P1b: same but measurement (no date) listed AFTER observation in cdm order.
SHAPES["p1b_no_date_mapping_after"] = {
    "person": SHAPES["p1_no_date_mapping"]["person"],
    "observation": SHAPES["p1_no_date_mapping"]["observation"],
    "measurement": SHAPES["p1_no_date_mapping"]["measurement"],
}

# P2: measurement maps obs.csv with date but NO person_id_mapping.
SHAPES["p2_no_pid_mapping"] = {
    "person": {"demo.csv": PERSON_MAP},
    "measurement": {
        "obs.csv": {
            "date_mapping": {"source_field": "when2", "dest_field": ["measurement_datetime"]},
            "concept_mappings": {
                "code": {"v1": {"measurement_concept_id": [3001]}}
            },
        }
    },
    "observation": {
        "obs.csv": {
            "person_id_mapping": PID,
            "date_mapping": {"source_field": "when", "dest_field": ["observation_datetime"]},
            "concept_mappings": OBS_CM,
        }
    },
}

# P3: the person FILE also feeds observation (v1 fan-out analog).
SHAPES["p3_person_file_fanout"] = {
    "person": {"demo.csv": PERSON_MAP},
    "observation": {
        "demo.csv": {
            "person_id_mapping": PID,
            "date_mapping": {"source_field": "dob", "dest_field": ["observation_datetime"]},
            "concept_mappings": {
                "eth": {"e0": {"observation_concept_id": [4001]},
                         "original_value": ["observation_source_value"]}
            },
        },
        "obs.csv": {
            "person_id_mapping": PID,
            "date_mapping": {"source_field": "when", "dest_field": ["observation_datetime"]},
            "concept_mappings": OBS_CM,
        },
    },
}

# P4: person target from TWO source files.
SHAPES["p4_person_two_files"] = {
    "person": {
        "demo.csv": PERSON_MAP,
        "demo2.csv": {
            "person_id_mapping": PID,
            "date_mapping": {"source_field": "dob2", "dest_field": ["birth_datetime"]},
            "concept_mappings": {
                "sex2": {"M": {"gender_concept_id": [8507]},
                          "original_value": ["gender_source_value"]}
            },
        },
    },
    "observation": {
        "obs.csv": {
            "person_id_mapping": PID,
            "date_mapping": {"source_field": "when", "dest_field": ["observation_datetime"]},
            "concept_mappings": OBS_CM,
        }
    },
}

# P5: date dest is the date-ONLY column (observation_date), not *_datetime.
SHAPES["p5_date_only_dest"] = {
    "person": {"demo.csv": PERSON_MAP},
    "observation": {
        "obs.csv": {
            "person_id_mapping": PID,
            "date_mapping": {"source_field": "when", "dest_field": ["observation_date"]},
            "concept_mappings": OBS_CM,
        }
    },
}

# P6: rules field names case-flipped vs the CSV header.
SHAPES["p6_case_flip"] = {
    "person": {
        "demo.csv": {
            "person_id_mapping": {"source_field": "PID", "dest_field": "person_id"},
            "date_mapping": {"source_field": "DOB", "dest_field": ["birth_datetime"]},
            "concept_mappings": {
                "SEX": {"M": {"gender_concept_id": [8507]},
                         "F": {"gender_concept_id": [8532]},
                         "original_value": ["gender_source_value"]}
            },
        }
    },
    "observation": {
        "obs.csv": {
            "person_id_mapping": {"source_field": "Pid", "dest_field": "person_id"},
            "date_mapping": {"source_field": "WHEN", "dest_field": ["observation_datetime"]},
            "concept_mappings": {
                "CODE": {"v1": {"observation_concept_id": [9010]},
                          "original_value": ["observation_source_value"]}
            },
        }
    },
}

# P7: the main datetime source is ALSO a concept field (in-place
# normalisation feeds term matching).
SHAPES["p7_date_is_concept_field"] = {
    "person": {"demo.csv": PERSON_MAP},
    "observation": {
        "obs.csv": {
            "person_id_mapping": PID,
            "date_mapping": {"source_field": "when", "dest_field": ["observation_datetime"]},
            "concept_mappings": {
                "when": {
                    "2020-01-01 10:00:00": {"observation_concept_id": [7100]},
                    "2020-01-01T10:00:00": {"observation_concept_id": [7200]},
                    "*": {"observation_concept_id": [7900]},
                    "original_value": ["observation_source_value"],
                }
            },
        }
    },
}

# P8: pid source field == the date source field.
SHAPES["p8_pid_is_date"] = {
    "person": {"demo.csv": PERSON_MAP},
    "observation": {
        "obs.csv": {
            "person_id_mapping": {"source_field": "when", "dest_field": "person_id"},
            "date_mapping": {"source_field": "when", "dest_field": ["observation_datetime"]},
            "concept_mappings": OBS_CM,
        }
    },
}



# P9: NO table maps a date for obs.csv -> whole file skipped with warning.
SHAPES["p9_file_no_date_at_all"] = {
    "person": {"demo.csv": PERSON_MAP},
    "observation": {
        "obs.csv": {
            "person_id_mapping": PID,
            "concept_mappings": OBS_CM,
        }
    },
    "measurement": {
        "obs.csv": {
            "person_id_mapping": PID,
            "concept_mappings": {"code": {"v1": {"measurement_concept_id": [3001]}}},
        }
    },
}

# P10: no table maps a PID for obs.csv (dates present) -> also skipped?
SHAPES["p10_file_no_pid_at_all"] = {
    "person": {"demo.csv": PERSON_MAP},
    "observation": {
        "obs.csv": {
            "date_mapping": {"source_field": "when", "dest_field": ["observation_datetime"]},
            "concept_mappings": OBS_CM,
        }
    },
}


def main() -> None:
    wanted = sys.argv[1:] or list(SHAPES)
    extra = {
        "p4_person_two_files": {
            "demo2.csv": "pid,sex2,dob2\np002,M,1970-01-01\np009,M,1960-05-05\n"
        }
    }
    for name in wanted:
        run(name, SHAPES[name], extra.get(name))


if __name__ == "__main__":
    main()
