from .recognizer import CTCRecognizer, CTCRecognizerNet
from .recognizer2d import Ctc2dRecognizer, Ctc2dRecognizerNet
from .resnet import BasicBlock, Bottleneck, ResNet, resnet18, resnet34, resnet50, resnet101
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
    "resnet101",
    "BiLSTM",
    "LSTM",
    "StackedBiLSTM",
    "TransformerEncoder",
]
