"""Reference hyperparameter recipes, as python dicts.

These reproduce the reference's published settings files (settings/*.json:
default, VRACER, RACER, RACER_atari, RACER_RNN, PPO, DPG, DQN, NAF, ACER,
CMA — values documented in BASELINE.md) so that
`HyperParameters.from_dict(RECIPES[name])` gives the exact recipe. Only
keys that differ from the HyperParameters defaults (which mirror
settings/default.json) are listed.
"""
from smarties_tpu.utils.config import HyperParameters

RECIPES = {
    # settings/default.json == HyperParameters defaults
    "default": {},
    # settings/VRACER.json
    "VRACER": {"learner": "VRACER", "dataSamplingAlgo": "uniform",
               "returnsEstimator": "retrace", "ERoldSeqFilter": "oldest",
               "nnLayerSizes": [128, 128]},
    # settings/RACER.json (same hyperparameters, Gaussian advantage)
    "RACER": {"learner": "RACER", "returnsEstimator": "retrace",
              "nnLayerSizes": [128, 128]},
    # settings/RACER_atari.json
    "RACER_atari": {"learner": "RACER", "batchSize": 128,
                    "clipImpWeight": 4, "explNoise": 0.05, "gamma": 0.99,
                    "learnrate": 1e-4, "maxTotObsNum": 262144,
                    "minTotObsNum": 131072, "nnLayerSizes": [512]},
    # settings/RACER_RNN.json
    "RACER_RNN": {"learner": "VRACER", "nnType": "LSTM",
                  "nnLayerSizes": [32, 32], "nnBPTTseq": 16,
                  "batchSize": 128, "clipImpWeight": 4},
    # settings/PPO.json
    "PPO": {"learner": "PPO", "batchSize": 64, "clipImpWeight": 0.2,
            "encoderLayerSizes": [64], "epsAnneal": 0, "gamma": 0.995,
            "lambda": 0.97, "obsPerStep": 6.4, "learnrate": 1e-4,
            "maxTotObsNum": 2048, "nnLayerSizes": [64],
            "klDivConstraint": 0.01},
    # settings/DPG.json
    "DPG": {"learner": "DPG", "returnsEstimator": "retrace",
            "batchSize": 128, "encoderLayerSizes": [128],
            "epsAnneal": 5e-7, "explNoise": 0.2, "gamma": 0.995,
            "learnrate": 1e-5, "nnLayerSizes": [128],
            "targetDelay": 0.001},
    # settings/DQN.json
    "DQN": {"learner": "DQN", "batchSize": 128, "clipImpWeight": 0,
            "epsAnneal": 0, "explNoise": 0.05, "gamma": 0.99,
            "learnrate": 1e-4, "maxTotObsNum": 524288,
            "minTotObsNum": 131072, "nnLayerSizes": [128, 128],
            "targetDelay": 1e-4},
    # settings/NAF.json
    "NAF": {"learner": "NAF", "returnsEstimator": "retrace",
            "batchSize": 256, "epsAnneal": 5e-7, "explNoise": 0.2,
            "gamma": 0.995, "learnrate": 1e-4, "nnLayerSizes": [128, 128],
            "targetDelay": 1e-4},
    # settings/ACER.json
    "ACER": {"learner": "ACER", "batchSize": 24, "clipImpWeight": 5,
             "encoderLayerSizes": [128], "epsAnneal": 5e-7,
             "explNoise": 0.4472135955, "gamma": 0.995,
             "klDivConstraint": 1, "learnrate": 1e-5,
             "maxTotObsNum": 131072, "minTotObsNum": 131072,
             "nnLayerSizes": [128], "targetDelay": 0.001},
    # settings/CMA.json
    "CMA": {"learner": "CMA", "ESpopSize": 12, "batchSize": 32,
            "explNoise": 0.1, "gamma": 0.99, "learnrate": 0.01,
            "maxTotObsNum": 64000, "nnLayerSizes": [64, 64]},
}


def recipe(name: str) -> HyperParameters:
    return HyperParameters.from_dict(RECIPES[name])
