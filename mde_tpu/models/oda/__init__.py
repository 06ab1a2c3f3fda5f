from .encoder import ODASwinEncoder
from .models import ODAConvModel, ODALunaModel, ODALunaClsModel, ODABinsModel
