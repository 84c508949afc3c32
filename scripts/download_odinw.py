#!/usr/bin/env python
"""Download the ODinW-35 datasets (the reference's `download.py:9-26`:
wget + unzip from the HuggingFace GLIP dataset repo)."""

import argparse
import os
import subprocess

DATASETS = [
    "AerialMaritimeDrone", "AmericanSignLanguageLetters", "Aquarium", "BCCD",
    "boggleBoards", "brackishUnderwater", "ChessPieces", "CottontailRabbits",
    "dice", "DroneControl", "EgoHands", "HardHatWorkers", "MaskWearing",
    "MountainDewCommercial", "NorthAmericaMushrooms", "openPoetryVision",
    "OxfordPets", "Packages", "PascalVOC", "pistols", "PKLot", "plantdoc",
    "pothole", "Raccoon", "selfdrivingCar", "ShellfishOpenImages", "ThermalCheetah",
    "thermalDogsAndPeople", "UnoCards", "VehiclesOpenImages", "websiteScreenshots",
    "WildfireSmoke",
]
BASE = "https://huggingface.co/GLIPModel/GLIP/resolve/main/odinw_35"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="datasets/odinw")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()
    os.makedirs(args.root, exist_ok=True)
    names = args.only or DATASETS
    for name in names:
        url = f"{BASE}/{name}.zip"
        zip_path = os.path.join(args.root, f"{name}.zip")
        print("downloading", url)
        subprocess.run(["wget", "-c", "-O", zip_path, url], check=True)
        subprocess.run(["unzip", "-o", "-q", zip_path, "-d", args.root], check=True)
        os.remove(zip_path)


if __name__ == "__main__":
    main()
