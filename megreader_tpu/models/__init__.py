from .recognizer import CTCRecognizer, CTCRecognizerNet
from .recognizer2d import Ctc2dRecognizer, Ctc2dRecognizerNet
from .resnet import BasicBlock, Bottleneck, ResNet, resnet18, resnet34, resnet50
from .sequence import BiLSTM, LSTM, StackedBiLSTM, TransformerEncoder

__all__ = [
    "CTCRecognizer",
    "CTCRecognizerNet",
    "Ctc2dRecognizer",
    "Ctc2dRecognizerNet",
    "BasicBlock",
    "Bottleneck",
    "ResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "BiLSTM",
    "LSTM",
    "StackedBiLSTM",
    "TransformerEncoder",
]
