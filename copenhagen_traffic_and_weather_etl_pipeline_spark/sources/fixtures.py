"""Canned API response documents (FIXTURES.md §2) shaped like the live
TomTom / OpenWeather payloads the reference flattens
(deployment_function.py:95-103, :138-151). Deterministic; used by tests
and the demo ingestion run. Values are synthetic.
"""

from __future__ import annotations

import json
from typing import Any


def tomtom_doc(
    current_speed: int = 42,
    free_flow_speed: int = 50,
    frc: str = "FRC2",
    confidence: float = 0.97,
    road_closure: bool = False,
    coords: list[tuple[float, float]] | None = None,
) -> dict[str, Any]:
    """Shape per deployment_function.py:95-103 — nested object + an array
    of >=2 coordinate structs (first/last are extracted)."""
    coords = coords or [(55.690388, 12.537862), (55.6905, 12.5380), (55.6910, 12.5391)]
    return {
        "flowSegmentData": {
            "frc": frc,
            "currentSpeed": current_speed,
            "freeFlowSpeed": free_flow_speed,
            "currentTravelTime": 120,
            "freeFlowTravelTime": 100,
            "confidence": confidence,
            "roadClosure": road_closure,
            "coordinates": {
                "coordinate": [
                    {"latitude": la, "longitude": lo} for la, lo in coords
                ]
            },
        }
    }


def openweather_doc(
    temp_k: float = 290.15,
    weather_main: str = "Clouds",
    description: str = "scattered clouds",
    name: str = "Copenhagen",
) -> dict[str, Any]:
    """Shape per deployment_function.py:138-151 — `weather` array (index 0
    used), `main` object with Kelvin temps, wind/clouds/sys scalars."""
    return {
        "weather": [{"main": weather_main, "description": description}],
        "main": {
            "temp": temp_k,
            "feels_like": temp_k - 1.0,
            "temp_min": temp_k - 2.5,
            "temp_max": temp_k + 1.5,
            "pressure": 1012,
            "humidity": 76,
        },
        "visibility": 10000,
        "wind": {"speed": 5.1, "deg": 240},
        "clouds": {"all": 40},
        "sys": {"country": "DK"},
        "name": name,
    }


# Malformed variants for fault-isolation tests (deployment_function.py:123-125,
# :174-176, :212-214): extraction must drop the row and continue.
MALFORMED_TRAFFIC = json.dumps({"unexpected": {"shape": 1}})
EMPTY_WEATHER_ARRAY = json.dumps({"weather": [], "main": {}, "sys": {}})
NOT_JSON = "<html>502 Bad Gateway</html>"
